"""Vectorized pandas/Arrow UDFs and SparkSession helpers."""
