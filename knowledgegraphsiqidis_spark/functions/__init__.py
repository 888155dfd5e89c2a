"""Pure-Python/pandas kernels shared by Spark UDFs and the pytest parity suite."""
