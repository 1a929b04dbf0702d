"""Pure (no-Spark) NumPy kernels shared by the Spark UDFs and the single-node
test oracle. Keeping the kernels Spark-free makes the P/R parity gate exact:
the distributed pipeline and the sequential oracle run byte-identical math.
"""
