"""Engine-named SQL functions (SURVEY §7 optional nicety: a registered
function surface for ``spark.sql`` users).

``register_engine_functions(spark)`` exposes the engine's helper
semantics by name in SQL. Where possible each helper is a *builtin
composition* registered through the SQL function catalog (stays inside
codegen); only genuinely procedural helpers fall back to Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, StringType


def register_engine_functions(spark: SparkSession) -> list[str]:
    """Register all engine functions; returns the registered names."""
    names: list[str] = []

    # ceil-division (shard/pyramid grid math) — pure SQL lambda function.
    spark.udf.register(
        "engine_ceil_div",
        lambda a, b: -(-a // b) if b else None,
        IntegerType(),
    )
    names.append("engine_ceil_div")

    # number of shards covering a 3-D shape
    spark.udf.register(
        "engine_shard_count",
        lambda z, y, x, s: (-(-z // s)) * (-(-y // s)) * (-(-x // s)),
        IntegerType(),
    )
    names.append("engine_shard_count")

    # cosine similarity of two double arrays (sequential fold, matches
    # queries/similarity_q semantics)
    def _cos(a, b):
        if not a or not b or len(a) != len(b):
            return None
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        if na == 0 or nb == 0:
            return None
        return dot / (na * nb)

    spark.udf.register("engine_cosine", _cos, DoubleType())
    names.append("engine_cosine")

    # whitespace tokenizer returning the word array (argless split():
    # any whitespace run is one separator, no empty tokens)
    spark.udf.register(
        "engine_tokenize",
        lambda s: s.split() if s else [],
        ArrayType(StringType()),
    )
    names.append("engine_tokenize")

    # OME-NGFF level translation for factor-2 pyramids (G2 closed form)
    spark.udf.register(
        "engine_level_translation",
        # float(): SQL decimal literals arrive as decimal.Decimal
        lambda level, voxel: (2.0 ** int(level) - 1) / 2.0 * float(voxel),
        DoubleType(),
    )
    names.append("engine_level_translation")
    return names
