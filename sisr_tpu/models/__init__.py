"""Model zoo package: Flax architectures + functional handlers + the client interface."""
