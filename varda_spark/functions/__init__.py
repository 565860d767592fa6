from varda_spark.functions.variant import normalize_chromosome, normalize_variant_cols

__all__ = ["normalize_chromosome", "normalize_variant_cols"]
