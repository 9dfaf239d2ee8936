"""Expression builders (vector math, text heuristics) used by operators.

Everything here composes built-in Spark SQL expressions — higher-order
functions over array columns — so the hot path stays JVM-side inside
whole-stage codegen. No Python UDFs.
"""
