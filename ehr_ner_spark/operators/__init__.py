"""Spark-side operators: each module declares a DataFrame plan (Catalyst
optimizes it) and drops to Arrow-batched pandas UDFs only for the kernels
Spark's built-ins cannot express (scoring, IOB2 decode, MinHash signatures).
"""
