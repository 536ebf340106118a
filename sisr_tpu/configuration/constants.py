"""Directory layout and hard-coded dataset splits.

Mirrors the reference constants (ref: Code/SISR/configuration/constants.py:1-19):
``Results/ Data/ Scratch/`` directories are siblings of the package base directory and
the celeba/div2k/flickr2k train/eval/test splits are fixed index ranges.
"""
import os

base_directory = os.path.abspath(os.path.join(__file__, os.path.pardir, os.path.pardir))
results_directory = os.path.join(os.path.dirname(os.path.dirname(base_directory)), 'Results')
data_directory = os.path.join(os.path.dirname(os.path.dirname(base_directory)), 'Data')
scratch_directory = os.path.join(os.path.dirname(os.path.dirname(base_directory)), 'Scratch')

# Dataset splits (ref: constants.py:9-14)
data_splits = {'celeba': {'train': (0, 162770),
                          'eval': (162770, 182637),
                          'test': (182637, 202599)},
               'div2k': {'train': (0, 800),
                         'eval': (800, 900)},
               'flickr2k': {'train': (0, 2650)}}

# Other configs (ref: constants.py:17-19)
temp_dump = os.path.join(results_directory, 'temp')
vggface_weights = os.path.join(base_directory, 'external_packages/VGGFace/vgg_face_dag.pth')
lightcnn_weights = os.path.join(base_directory, 'external_packages/LightCNN/LightCNN_29Layers_checkpoint.pth.tar')
