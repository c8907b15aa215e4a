"""Large-scale training-data operations over document/embedding tables.

Everything here is pure DataFrame algebra (JVM-side, whole-stage codegen) —
no Python UDFs. Hashes are md5-based rather than xxhash64 so that a DuckDB
oracle can reproduce every value bit-for-bit; at production scale xxhash64 is
a drop-in swap (same plan shape, cheaper hash).
"""
