"""mode="pallas" step entry: the fused single-sweep substep (fused.py) with
automatic fallback to the per-pass kernels (bucket_kernels.py) for configs
whose plane working set exceeds VMEM, and to the XLA bucketed engine for
2D / fixed-point configs."""

import os

if os.environ.get("MPM_PALLAS_OLD", "0") == "1":  # perf-attribution knob
    from .bucket_kernels import substep  # noqa: F401
else:
    from .fused import substep_fused as substep  # noqa: F401
