"""mode="pallas" step entry (see bucket_kernels.py)."""

from .bucket_kernels import substep  # noqa: F401
