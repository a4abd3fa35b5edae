"""Canonicalization (SURVEY.md §2.7 G6 + north_rule).

Cross-corpus entity canonicalization = connected components over an entity
similarity graph:
- redirect edges, resolved to their chain roots first
  (reference db_pedia.py:37-71)
- shared-normalized-surface edges (entities whose anchor surfaces collide
  after lowercasing)
- optional MinHash edges over surface shingles for fuzzy matches
  (dedup.minhash_lsh_pairs on the surface strings)

Output: (entity, canonical) where canonical = min entity id per component,
plus (canonical, altLabel surface) rows for the triple store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from thesaurus_based_ner_spark.operators.graph import (
    connected_components_twostar,
    resolve_chains,
)


def surface_star_edges(anchor: DataFrame, n_salt: int = 1) -> DataFrame:
    """Shared-normalized-surface edges as a STAR to the per-surface hub.

    A pairwise self-join on nsurf emits S²/2 edges for a surface shared by
    S entities — a head surface like "USA" shared by 10⁴ entities would
    generate 5·10⁷ edges from one key at web scale. Connected components
    are invariant to star-vs-clique edges, so emit (hub=min entity, other)
    instead: O(S) edges, one window shuffle on nsurf, no join.

    ``n_salt > 1`` additionally bounds the per-TASK skew: the plain star
    still routes all S rows of one surface through a single window
    partition, so a 10⁷-entity head key pins one task at web scale. With
    salting, entities are hashed into ``n_salt`` buckets; pass 1 stars each
    (nsurf, bucket) group to its bucket hub (partition size ≤ ~S/n_salt),
    pass 2 stars the ≤ n_salt bucket hubs per surface to a global hub.
    Components are identical to the unsalted star (the bucket stars plus
    the hub star connect exactly the same surface group); edge count stays
    linear: ≤ S-1 within-bucket + ≤ n_salt-1 hub edges per surface.
    Both passes are windows — no join, no cartesian product.
    """
    # NULL/empty surfaces must NOT edge: Window.partitionBy treats NULL as
    # an ordinary key, so without this filter every entity with an
    # unparsed surface would star-edge to one hub and collapse into a
    # single canonical cluster. The pre-star pairwise join was only
    # NULL-rejecting — empty/whitespace surfaces DID match each other
    # ('' == '') and clustered there; dropping them here is an intentional
    # divergence (an all-empty-surface mega-cluster is never a desirable
    # canonical entity), not an equivalence (ADVICE r4).
    surf = (
        anchor.filter(
            F.col("surface").isNotNull() & (F.trim(F.col("surface")) != "")
        )
        .select(F.col("entity"), F.lower(F.col("surface")).alias("nsurf"))
        .distinct()
    )
    if n_salt <= 1:
        hub = F.min("entity").over(Window.partitionBy("nsurf"))
        return (
            surf.withColumn("__hub", hub)
            .filter(F.col("entity") != F.col("__hub"))
            .select(F.col("__hub").alias("a"), F.col("entity").alias("b"))
        )
    salted = surf.withColumn(
        "__b", F.pmod(F.xxhash64("entity"), F.lit(n_salt))
    )
    bucket_hub = F.min("entity").over(Window.partitionBy("nsurf", "__b"))
    starred = salted.withColumn("__hub", bucket_hub)
    within = starred.filter(F.col("entity") != F.col("__hub")).select(
        F.col("__hub").alias("a"), F.col("entity").alias("b")
    )
    # ≤ n_salt bucket hubs per surface — the second window's partitions
    # are bounded by n_salt regardless of how hot the surface is.
    hubs = starred.select("nsurf", F.col("__hub").alias("entity")).distinct()
    global_hub = F.min("entity").over(Window.partitionBy("nsurf"))
    across = (
        hubs.withColumn("__ghub", global_hub)
        .filter(F.col("entity") != F.col("__ghub"))
        .select(F.col("__ghub").alias("a"), F.col("entity").alias("b"))
    )
    return within.unionByName(across)


def canonicalize_entities(
    anchor: DataFrame,
    redirects: DataFrame | None = None,
    n_salt: int = 1,
) -> DataFrame:
    """(entity, canonical) map via CC over surface+redirect edges."""
    edges = surface_star_edges(anchor, n_salt=n_salt)
    if redirects is not None:
        red = resolve_chains(redirects, "src", "dst").select(
            F.col("src").alias("a"), F.col("root").alias("b")
        )
        edges = edges.unionByName(red)
    cc = connected_components_twostar(edges.distinct())
    all_entities = anchor.select("entity").distinct()
    return (
        all_entities.join(
            cc.withColumnRenamed("node", "entity"), "entity", "left"
        )
        .select(
            "entity",
            F.coalesce("component", F.col("entity")).alias("canonical"),
        )
    )


def alt_labels(anchor: DataFrame, canon: DataFrame) -> DataFrame:
    """(canonical, surface) distinct alt-label pairs for the triple store."""
    return (
        anchor.join(canon, "entity")
        .select("canonical", "surface")
        .distinct()
    )
