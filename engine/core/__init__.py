"""Pure-Python extraction kernels (no Spark imports).

Every function here is deterministic and side-effect free. The same code runs
(a) inside vectorized pandas UDFs on executors and (b) directly in pytest as
the oracle, so Spark-vs-oracle equality is equality of one code path invoked
two ways, plus frozen golden vectors that pin the behavior against the
reference (`/root/reference`, cited per function).
"""
