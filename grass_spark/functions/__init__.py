from grass_spark.functions.kernels import KERNELS, agg_exprs  # noqa: F401
