"""Reddit source adapter (SURVEY.md §2.1 S7).

The reference pulls top-20 weekly submissions per subreddit through
praw and each post's comments through the public
``/r/<sub>/comments.json`` endpoint, then eagerly regex-cleans every
string on the driver (reddit_data/common_stock.py:129-161).  The
engine splits that into:

- a (stubbable) driver-side FETCH that lands raw JSON text — network
  I/O is an adapter concern, exactly like sources/yahoo.py;
- a DISTRIBUTED parse: ``spark.read.json`` / ``from_json`` with
  explicit schemas (JVM-side, no Python in the loop), exploding the
  comments envelope into one row per comment;
- a long ``documents``-shaped output (subreddit, post_id, source,
  text) that plans/common_stock.py's ticker pipeline consumes
  unchanged — cleaning happens lazily in the plan (functions/text.py),
  not eagerly at ingest.

Fixture JSON files stand in for the live API in tests; a praw-backed
fetcher drops into ``fetch`` without touching the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# praw submission fields the reference touches (title, selftext) plus
# identity/grouping keys
POST_SCHEMA = T.StructType(
    [
        T.StructField("subreddit", T.StringType()),
        T.StructField("post_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("selftext", T.StringType()),
    ]
)

# the /r/<sub>/comments.json envelope: {"data": {"children":
# [{"data": {"body": ...}}, ...]}} (common_stock.py:141-144)
COMMENTS_ENVELOPE = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField(
                        "children",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "data",
                                        T.StructType(
                                            [T.StructField("body", T.StringType())]
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)


def posts_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Submissions from JSON-lines files (one post object per line)."""
    return spark.read.schema(POST_SCHEMA).json(path)


def comments_from_envelope(
    df: DataFrame, json_col: str = "comments_json", post_id_col: str = "post_id"
) -> DataFrame:
    """Explode a raw ``comments.json`` envelope string column into one
    row per comment body: (post_id, comment_idx, body). Missing bodies
    become empty strings (the reference substitutes '' when 'body' is
    absent, common_stock.py:152)."""
    parsed = F.from_json(F.col(json_col), COMMENTS_ENVELOPE)
    exploded = df.select(
        F.col(post_id_col),
        F.posexplode_outer(parsed["data"]["children"]).alias("comment_idx", "child"),
    )
    return exploded.select(
        post_id_col,
        "comment_idx",
        F.coalesce(F.col("child.data.body"), F.lit("")).alias("body"),
    )


def reddit_documents(posts: DataFrame, comments: DataFrame) -> DataFrame:
    """The long documents frame the common-stock pipeline consumes:
    (subreddit, post_id, source, text) with source ∈ {title, selftext,
    comment} — the distributed analogue of the reference's 3-column
    frame of cleaned token lists (title/selftext/comments,
    common_stock.py:146-160); cleaning stays in the query plan."""
    titles = posts.select(
        "subreddit", "post_id", F.lit("title").alias("source"), F.col("title").alias("text")
    )
    bodies = posts.select(
        "subreddit",
        "post_id",
        F.lit("selftext").alias("source"),
        F.col("selftext").alias("text"),
    )
    comm = (
        # posexplode_outer keeps a null-idx placeholder for posts with
        # no/unfetchable comments (provenance); it is not a document
        comments.filter(F.col("comment_idx").isNotNull())
        .join(F.broadcast(posts.select("subreddit", "post_id")), "post_id")
        .select(
            "subreddit",
            "post_id",
            F.lit("comment").alias("source"),
            F.col("body").alias("text"),
        )
    )
    return titles.unionByName(bodies).unionByName(comm)
