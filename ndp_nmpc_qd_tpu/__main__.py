import os

# Accelerator missions use the same kernel block size as the bench (2048
# lanes; see bench.py) — must be set before ops.pallas.riccati imports.
# Harmless for CPU runs: the scan backend ignores it and CLI --cpu paths
# never touch the packed kernels.
os.environ.setdefault("QD_TPU_SUB", "16")

from .cli import main  # noqa: E402

main()
