"""Pure, process-local kernels shared by the distributed pipeline and the oracle."""
