"""JM/YUV420p contract: the numpy YUV plumbing that replaces skvideo/ffmpeg
(tools/data_converter.py rgb_to_yuv420p/yuv420p_to_rgb, ref: sr_tools/
data_converter.py:196-245) and the jm_compress subprocess orchestration driven
end-to-end through a fake ``lencod.exe``.
"""
import os
import stat

import numpy as np
import pandas as pd
import pytest
from PIL import Image

from sisr_tpu.tools.data_converter import (ConversionHub, rgb_to_yuv420p,
                                           yuv420p_to_rgb)


def test_yuv420p_golden_values():
    """BT.601 studio-range anchors: white->Y235, black->Y16, red->(81,90,240)."""
    def one(rgb):
        img = np.tile(np.array(rgb, np.uint8), (2, 2, 1))
        data = rgb_to_yuv420p(img)
        y = data[0]
        u = data[4]
        v = data[5]
        return y, u, v

    assert one((255, 255, 255)) == (235, 128, 128)
    assert one((0, 0, 0)) == (16, 128, 128)
    assert one((255, 0, 0)) == (81, 90, 240)
    assert one((0, 255, 0)) == (145, 54, 34)
    assert one((0, 0, 255)) == (41, 240, 110)


def test_yuv420p_roundtrip():
    """rgb -> yuv420p -> rgb is near-lossless when chroma is 2x2-constant (the
    only loss channel is 4:2:0 subsampling + studio-range quantization)."""
    rng = np.random.RandomState(3)
    # random 2x2-block image: chroma constant within each subsampling block
    small = rng.randint(0, 256, (8, 10, 3), np.uint8)
    img = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    back = yuv420p_to_rgb(rgb_to_yuv420p(img), 16, 20)
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 3  # studio-range re-quantization only
    # plane sizes: Y full-res + U,V quarter-res
    assert len(rgb_to_yuv420p(img)) == 16 * 20 * 3 // 2


FAKE_LENCOD = r"""#!/usr/bin/env python3
# fake JM lencod: honours the -p key=val contract the real binary uses
import sys
params = {}
args = sys.argv[1:]
for i, a in enumerate(args):
    if a == '-p':
        k, v = args[i + 1].split('=', 1)
        params[k] = v
h, w = int(params['SourceHeight']), int(params['SourceWidth'])
qpi = int(params['QPISlice'])
with open(params['InputFile'], 'rb') as f:
    data = bytearray(f.read(h * w * 3 // 2))
# 'compress': quantize the Y plane proportionally to QPI (monotone degradation)
step = max(1, qpi // 4)
for i in range(h * w):
    data[i] = (data[i] // step) * step
with open(params['ReconFile'], 'wb') as f:
    f.write(bytes(data))
with open(params['OutputFile'], 'wb') as f:
    f.write(b'h264')
with open(params['StatsFile'], 'w') as f:
    f.write('stats')
"""


@pytest.fixture
def fake_jm(tmp_path, monkeypatch):
    """Install a fake JM tree and point the converter's base_directory under it."""
    from sisr_tpu.configuration import constants as sconst
    fake_base = tmp_path / 'fake_repo' / 'sisr_tpu'
    jm_bin = tmp_path / 'fake_repo' / 'JM' / 'bin'
    jm_bin.mkdir(parents=True)
    fake_base.mkdir(parents=True)
    lencod = jm_bin / 'lencod.exe'
    lencod.write_text(FAKE_LENCOD)
    lencod.chmod(lencod.stat().st_mode | stat.S_IXUSR)
    (jm_bin / 'encoder_baseline.cfg').write_text('# fake cfg\n')
    monkeypatch.setattr(sconst, 'base_directory', str(fake_base))
    return jm_bin


def test_jm_compress_end_to_end(tmp_path, fake_jm):
    """jm_compress through the real orchestration: YUV temp files, per-QPI _qN
    outputs, QPI metadata CSV, temp-file cleanup (ref: data_converter.py:100-176)."""
    src = tmp_path / 'src'
    out = tmp_path / 'out'
    src.mkdir()
    rng = np.random.RandomState(5)
    for name in ('alpha', 'beta'):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            str(src / ('%s.png' % name)))

    hub = ConversionHub(str(src), str(out))
    hub.run_conversion(['jm_compress'], random_compression=True,
                       compression_range=(10, 50), qpi_divisions=2)

    files = sorted(os.listdir(str(out)))
    assert 'alpha_q0.png' in files and 'alpha_q1.png' in files
    assert 'beta_q0.png' in files and 'beta_q1.png' in files
    # temp files cleaned up
    assert not any(f.startswith('vid_') or f.endswith('.dat') for f in files)

    df = pd.read_csv(str(out / 'degradation_metadata.csv'), index_col=0)
    assert list(df.columns) == ['QPI']
    assert len(df) == 4
    # generate_range split: q0 in [10,30), q1 in [30,50)
    assert (df.loc[['alpha_q0.png', 'beta_q0.png'], 'QPI'] < 30).all()
    assert (df.loc[['alpha_q1.png', 'beta_q1.png'], 'QPI'] >= 30).all()

    # higher QPI -> heavier quantization -> larger deviation from the source
    src_im = np.asarray(Image.open(str(src / 'alpha.png')), int)
    err = {q: np.abs(np.asarray(Image.open(str(out / ('alpha_%s.png' % q))),
                                int) - src_im).mean() for q in ('q0', 'q1')}
    assert err['q1'] > err['q0'] > 0


def test_jm_compress_fixed_qpi(tmp_path, fake_jm):
    """Non-random path: single output per image at the requested QPI."""
    src = tmp_path / 'src'
    out = tmp_path / 'out'
    src.mkdir()
    Image.fromarray(np.full((8, 8, 3), 200, np.uint8)).save(str(src / 'im.png'))
    hub = ConversionHub(str(src), str(out))
    hub.run_conversion(['jm_compress'], jm_qpi=28)
    df = pd.read_csv(str(out / 'degradation_metadata.csv'), index_col=0)
    assert df.loc['im.png', 'QPI'] == 28
    assert os.path.isfile(str(out / 'im.png'))


def test_jm_missing_encoder_errors(tmp_path):
    """Without a JM build, jm_compress refuses with a clear message."""
    src = tmp_path / 'src'
    src.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(str(src / 'im.png'))
    hub = ConversionHub(str(src), str(tmp_path / 'out'))
    with pytest.raises(RuntimeError, match='JM encoder not found'):
        hub.run_conversion(['jm_compress'])
