"""IMDb dataset ingest schemas + cleaning ETL (SURVEY.md §1.4/§2.1 S1) —
the seven StructTypes the reference declares inline per loader
(utils/data_loader.py:39-113), in ONE module, with the boundary cleaning
the reference defers to query time (app.py:230-231's regex year guard,
app.py:355's genre split) applied ONCE at ingest.

Raw IMDb TSVs use ``\\N`` for null and pack lists as comma-joined strings;
year-ish columns arrive as digit strings with stray junk. The clean step
normalizes all of that so every downstream query works on real types:
nullable INT years, ArrayType genre/profession/title lists.

Scale notes: gzip TSV is a one-task scan per file — ingest parallelism is
the file count, which is why :func:`ingest_imdb_table` lands parquet
immediately (land_as_parquet) and everything downstream reads columnar
splits. The reference instead eagerly ``count()``s each table before its
JDBC write — an extra full pass over non-splittable gzip per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import FloatType, IntegerType, StringType, StructField, StructType

from .ingest import clean_year, read_tsv, split_packed_list


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


#: utils/data_loader.py:39-50 — title.basics.tsv.gz
TITLES_SCHEMA = _s(
    ("tconst", StringType()),
    ("titleType", StringType()),
    ("primaryTitle", StringType()),
    ("originalTitle", StringType()),
    ("isAdult", IntegerType()),
    ("startYear", StringType()),  # digit-string w/ junk → cleaned to INT
    ("endYear", StringType()),
    ("runtimeMinutes", StringType()),
    ("genres", StringType()),  # comma-packed → cleaned to array<string>
)

#: utils/data_loader.py:52-61 — title.akas.tsv.gz
AKAS_SCHEMA = _s(
    ("titleId", StringType()),
    ("ordering", IntegerType()),
    ("title", StringType()),
    ("region", StringType()),
    ("language", StringType()),
    ("types", StringType()),
    ("attributes", StringType()),
    ("isOriginalTitle", IntegerType()),
)

#: utils/data_loader.py:63-67 — title.ratings.tsv.gz
RATINGS_SCHEMA = _s(
    ("tconst", StringType()),
    ("averageRating", FloatType()),
    ("numVotes", IntegerType()),
)

#: utils/data_loader.py:69-76 — title.principals.tsv.gz
PRINCIPALS_SCHEMA = _s(
    ("tconst", StringType()),
    ("ordering", IntegerType()),
    ("nconst", StringType()),
    ("category", StringType()),
    ("job", StringType()),
    ("characters", StringType()),
)

#: utils/data_loader.py:78-83 — title.episode.tsv.gz
EPISODES_SCHEMA = _s(
    ("tconst", StringType()),
    ("parentTconst", StringType()),
    ("seasonNumber", StringType()),
    ("episodeNumber", StringType()),
)

#: utils/data_loader.py:85-89 — title.crew.tsv.gz
CREW_SCHEMA = _s(
    ("tconst", StringType()),
    ("directors", StringType()),
    ("writers", StringType()),
)

#: utils/data_loader.py:91-98 — name.basics.tsv.gz
NAMES_SCHEMA = _s(
    ("nconst", StringType()),
    ("primaryName", StringType()),
    ("birthYear", StringType()),
    ("deathYear", StringType()),
    ("primaryProfession", StringType()),
    ("knownForTitles", StringType()),
)

#: utils/data_loader.py:106-113's file→schema map.
IMDB_SCHEMAS: dict[str, StructType] = {
    "title.basics.tsv.gz": TITLES_SCHEMA,
    "title.akas.tsv.gz": AKAS_SCHEMA,
    "title.ratings.tsv.gz": RATINGS_SCHEMA,
    "title.principals.tsv.gz": PRINCIPALS_SCHEMA,
    "title.episode.tsv.gz": EPISODES_SCHEMA,
    "title.crew.tsv.gz": CREW_SCHEMA,
    "name.basics.tsv.gz": NAMES_SCHEMA,
}

#: Per-table boundary cleaning: year-like digit strings → nullable INT,
#: comma-packed lists → array<string>. Everything else passes through.
_YEAR_COLUMNS: dict[str, tuple[str, ...]] = {
    "title.basics.tsv.gz": ("startYear", "endYear", "runtimeMinutes"),
    "title.episode.tsv.gz": ("seasonNumber", "episodeNumber"),
    "name.basics.tsv.gz": ("birthYear", "deathYear"),
}
_LIST_COLUMNS: dict[str, tuple[str, ...]] = {
    "title.basics.tsv.gz": ("genres",),
    "title.crew.tsv.gz": ("directors", "writers"),
    "name.basics.tsv.gz": ("primaryProfession", "knownForTitles"),
}


def clean_imdb_table(df: DataFrame, file_name: str) -> DataFrame:
    """Apply the boundary cleaning for one IMDb table (no-op for tables
    with nothing to clean). Pure column expressions — whole-stage codegen,
    applied once at ingest instead of per query."""
    for c in _YEAR_COLUMNS.get(file_name, ()):
        df = df.withColumn(c, clean_year(df[c]))
    for c in _LIST_COLUMNS.get(file_name, ()):
        df = df.withColumn(c, split_packed_list(df[c]))
    return df


def ingest_imdb_table(
    spark: SparkSession,
    tsv_path: str,
    file_name: str,
    out_path: str,
    *,
    partition_by: str | None = None,
) -> DataFrame:
    """End-to-end S1 ETL for one IMDb table: schema-enforced TSV read
    (``\\N`` nulls) → clean → land as parquet → return the landed frame.
    The reference's load_data loop (utils/data_loader.py:115-158) minus
    the eager counts and the JDBC staging hop."""
    from .ingest import land_as_parquet

    if file_name not in IMDB_SCHEMAS:
        raise KeyError(f"unknown IMDb file {file_name!r}")
    raw = read_tsv(spark, tsv_path, IMDB_SCHEMAS[file_name])
    cleaned = clean_imdb_table(raw, file_name)
    land_as_parquet(cleaned, out_path, partition_by=partition_by)
    return spark.read.parquet(out_path)
