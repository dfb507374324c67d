"""On-device ops: preprocessing, losses, verification, Pallas kernels."""
