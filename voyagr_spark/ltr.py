"""Learning-to-rank re-ranking (reference contrib solr/contrib/ltr).

Reference semantics re-expressed, not ported:

* Features (org.apache.solr.ltr.feature): `OriginalScoreFeature` (the
  first-pass score), `FieldValueFeature` (numeric stored field, default
  when missing), `SolrFeature` (another query's score for the doc, 0
  when it does not match), `ValueFeature` (constant).  Feature values
  are float32 (`Feature.FeatureWeight.FeatureScorer#score`).
* Normalizers (org.apache.solr.ltr.norm): Identity, MinMaxNormalizer
  `(v - min) / (max - min)`, StandardNormalizer `(v - avg) / std` —
  applied per feature before the model.
* `LinearModel.java#score`: `score += weights[i] * features[i]` — a
  float32 left-to-right fold over the declared feature order.
* `MultipleAdditiveTreesModel.java#score`: sum over trees of
  `tree.weight * root.score(features)`; a branch node goes LEFT when
  `featureValue <= threshold`, a leaf returns its value; the sum is the
  same float32 fold.
* `LTRQParserPlugin` / `reRankDocs`: only the first-pass top-N window is
  re-scored (the rerank window); results re-sort by the model score.

Spark-first shape: the rerank window is top-N-sized, so every feature
join broadcasts against it (the reference also evaluates features only
for the window's docs); the MODEL compiles to one Catalyst column —
linear = a chain of per-step float-cast multiply/adds, a regression
tree = nested `F.when(feature <= threshold, left).otherwise(right)` —
so model evaluation is whole-stage-codegen JVM work, no Python, and the
same expression renders to the DuckDB oracle verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class OriginalScore:
    """OriginalScoreFeature: the first-pass (BM25) score."""
    name: str = "originalScore"


@dataclass(frozen=True)
class FieldValue:
    """FieldValueFeature: a numeric docmap field (defaultValue when null)."""
    name: str
    fld: str = ""
    default: float = 0.0

    def __post_init__(self):
        if not self.fld:
            object.__setattr__(self, "fld", self.name)


@dataclass(frozen=True)
class QueryScore:
    """SolrFeature with a query: the query's score for the doc, 0.0f when
    the doc does not match it."""
    name: str
    query: str = ""


@dataclass(frozen=True)
class Value:
    """ValueFeature: a constant."""
    name: str
    value: float = 0.0


def extract_features(index, window: DataFrame, features) -> DataFrame:
    """The rerank window (doc_id, score) widened with one float32 column
    per feature — every join broadcasts the window (reRankDocs-sized)."""
    from .search import scores

    out = window
    for f in features:
        if isinstance(f, OriginalScore):
            out = out.withColumn(f.name, F.col("score").cast("float"))
        elif isinstance(f, Value):
            out = out.withColumn(f.name, F.lit(float(f.value)).cast("float"))
        elif isinstance(f, FieldValue):
            dm = index.docmap().select(
                "doc_id", F.col(f.fld).cast("float").alias(f.name))
            out = dm.join(F.broadcast(out), "doc_id", "right").withColumn(
                f.name,
                F.coalesce(F.col(f.name), F.lit(float(f.default))
                           .cast("float")))
        elif isinstance(f, QueryScore):
            qs = scores(index, f.query).withColumnRenamed("score", f.name)
            out = qs.join(F.broadcast(out), "doc_id", "right").withColumn(
                f.name,
                F.coalesce(F.col(f.name), F.lit(0.0).cast("float")))
        else:
            raise ValueError(f"unknown feature type: {f!r}")
    return out


# ---------------------------------------------------------------------------
# normalizers + models
# ---------------------------------------------------------------------------

def _normalize(col, norm):
    """None | ("minmax", mn, mx) | ("standard", avg, std) -> float32 col."""
    if norm is None:
        return col
    kind = norm[0]
    if kind == "minmax":  # MinMaxNormalizer.java
        mn, mx = float(norm[1]), float(norm[2])
        return ((col - F.lit(mn).cast("float")).cast("float")
                / F.lit(mx - mn).cast("float")).cast("float")
    if kind == "standard":  # StandardNormalizer.java
        avg, std = float(norm[1]), float(norm[2])
        return ((col - F.lit(avg).cast("float")).cast("float")
                / F.lit(std).cast("float")).cast("float")
    raise ValueError(f"unknown normalizer: {norm!r}")


@dataclass(frozen=True)
class LinearModel:
    """LinearModel.java: score = float32 fold of weight_i * feature_i in
    declared order; optional per-feature normalizers."""
    weights: tuple  # ((feature_name, weight), ...) — order matters
    norms: dict = field(default_factory=dict)

    def column(self):
        acc = None
        for name, w in self.weights:
            f = _normalize(F.col(name).cast("float"), self.norms.get(name))
            term = (F.lit(float(w)).cast("float") * f).cast("float")
            acc = term if acc is None else (acc + term).cast("float")
        return acc


def _tree_col(node, norms):
    if "value" in node:
        return F.lit(float(node["value"])).cast("float")
    f = _normalize(F.col(node["feature"]).cast("float"),
                   norms.get(node["feature"]))
    return F.when(
        f <= F.lit(float(node["threshold"])).cast("float"),
        _tree_col(node["left"], norms),
    ).otherwise(_tree_col(node["right"], norms))


@dataclass(frozen=True)
class TreesModel:
    """MultipleAdditiveTreesModel.java: score = float32 fold of
    tree_weight * tree(features); branch goes LEFT when
    feature <= threshold."""
    trees: tuple  # ((weight, root_node_dict), ...)
    norms: dict = field(default_factory=dict)

    def column(self):
        acc = None
        for w, root in self.trees:
            term = (F.lit(float(w)).cast("float")
                    * _tree_col(root, self.norms)).cast("float")
            acc = term if acc is None else (acc + term).cast("float")
        return acc


# ---------------------------------------------------------------------------
# the rerank entry point ({!ltr} / ReRankQuery)
# ---------------------------------------------------------------------------

def ltr_rerank(
    index, query_or_text, model, features,
    rerank_docs: int = 30, k: int = 10,
) -> DataFrame:
    """LTRQParserPlugin re-rank: first-pass top-`rerank_docs`, feature
    extraction over that window, model score replaces the ranking score,
    top-k re-sort (doc-id tie-break)."""
    from .search import search

    window = search(index, query_or_text, k=rerank_docs).select(
        "doc_id", "score")
    feats = extract_features(index, window, features)
    return (
        feats.withColumn("score", model.column())
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
