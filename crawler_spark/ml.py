"""ML / classification operators (SURVEY §2.M) — pyspark.ml pipelines.

Reference lineage (/root/reference/ml/features.py, core/classifier.py):
* M1 TF-IDF (features.py:197-348): TfidfVectorizer word 1-2 grams,
  max_features 5000, min_df 2 → here RegexTokenizer → CountVectorizer
  (vocabSize 5000, minDF 2) → IDF. (HashingTF would be faster at
  100 TB — no vocabulary broadcast — but CountVectorizer matches the
  reference's explicit-vocabulary semantics; both exposed.)
* M2 keyword-frequency features (features.py:34-60, 351-431): per
  domain, \\b-bounded keyword counts / len(keywords) — pure column
  expressions, no UDF.
* M3/M4 structural features (features.py:434-677): length, word/
  sentence/paragraph counts, punctuation ratios — column expressions.
* M5 feature union (features.py:727-764): VectorAssembler.
* M6/M7 classifier predict (classifier.py:138-388): LogisticRegression
  (OneVsRest for the multi-label domain case) over the assembled
  features; trained on the synthetic keyword-template corpus exactly
  like the reference's harness (ml/training/train_*.py:85-133 —
  seeded synthetic texts per class).
* M9 training harness: deterministic train/test split (seed 42,
  matching train_test_split(random_state=42)).

Everything heavy is JVM-side (pyspark.ml); no sklearn, no pickled
Python models on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import STOPWORDS

# keyword templates per class — the synthetic-corpus house style
# (reference train_content_model.py:85-133 builds labeled texts from
# per-class keyword lists the same way)
CLASS_KEYWORDS = {
    "question": ["how", "why", "what", "help", "answer", "ask"],
    "article": ["report", "analysis", "study", "review", "section"],
    "profile": ["expert", "bio", "experience", "rating", "career"],
    "other": ["misc", "note", "random", "general", "page"],
}


def synthetic_labeled_corpus(spark: SparkSession, n_per_class: int = 200) -> DataFrame:
    """Deterministic labeled texts from keyword templates (seeded by
    row index via the portable hash — no RNG)."""
    from .functions.url import hash60

    classes = list(CLASS_KEYWORDS)
    dfs = []
    for ci, cls in enumerate(classes):
        kws = CLASS_KEYWORDS[cls]
        base = spark.range(n_per_class).select(
            (F.col("id") + ci * n_per_class).alias("sample_id"),
            F.lit(cls).alias("label_str"),
            F.lit(float(ci)).alias("label"),
        )
        h = hash60(F.concat(F.lit(f"{cls}:"), F.col("sample_id").cast("string")))
        words = [
            F.element_at(
                F.array(*[F.lit(k) for k in kws]),
                (F.pmod(F.shiftright(h, i), len(kws)) + 1).cast("int"),
            )
            for i in range(8)
        ]
        filler = F.element_at(
            F.array(*[F.lit(s) for s in STOPWORDS[:8]]),
            (F.pmod(h, 8) + 1).cast("int"),
        )
        dfs.append(base.withColumn("text", F.concat_ws(" ", filler, *words)))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def tfidf_pipeline(vocab_size: int = 5000, min_df: int = 2):
    """M1: tokenize → CountVectorizer → IDF (reference params)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, CountVectorizer, RegexTokenizer

    tok = RegexTokenizer(
        inputCol="text", outputCol="tokens", pattern=r"\s+", toLowercase=True
    )
    cv = CountVectorizer(
        inputCol="tokens", outputCol="tf", vocabSize=vocab_size, minDF=float(min_df)
    )
    idf = IDF(inputCol="tf", outputCol="tfidf")
    return Pipeline(stages=[tok, cv, idf])


def _char_count(t, pattern: str):
    return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))).cast("double")


def structural_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """M4: the reference's FULL 12 structural features as pure columns
    (ml/features.py:554-677): length, word/sentence/paragraph counts,
    avg word/sentence lengths, punct/upper/digit/unique ratios, and
    the Persian-؟ / ! counts. All JVM-side, codegen'd; the per-batch
    max-normalization lives in `m4_structural` (scalar-agg join —
    one treeAggregate pass, no global window)."""
    t = F.col(text_col)
    words_arr = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    words = F.size(words_arr)
    sentences = F.size(F.filter(F.split(t, r"[.!?؟]"), lambda s: F.trim(s) != ""))
    paragraphs = F.size(F.filter(F.split(t, r"\n\s*\n"), lambda p: F.trim(p) != ""))
    n = F.length(t)
    return df.withColumns(
        {
            "f_len": (n / 1000.0),
            "f_words": words.cast("double"),
            "f_sentences": sentences.cast("double"),
            "f_paragraphs": paragraphs.cast("double"),
            "f_avg_word": F.when(words > 0, n / words).otherwise(0.0),
            "f_avg_sentence": F.when(
                sentences > 0, words.cast("double") / sentences
            ).otherwise(0.0),
            "f_punct_ratio": F.when(
                n > 0, _char_count(t, r"[^\w\s]") / n
            ).otherwise(0.0),
            "f_upper_ratio": F.when(n > 0, _char_count(t, "[A-Z]") / n).otherwise(0.0),
            "f_digit_ratio": F.when(n > 0, _char_count(t, r"\d") / n).otherwise(0.0),
            "f_unique_ratio": F.when(
                words > 0, F.size(F.array_distinct(words_arr)).cast("double") / words
            ).otherwise(0.0),
            "f_qmarks": _char_count(t, r"[?؟]"),
            "f_exclaims": _char_count(t, "!"),
        }
    )


STRUCTURAL_COLS = [
    "f_len", "f_words", "f_sentences", "f_paragraphs", "f_avg_word",
    "f_avg_sentence", "f_punct_ratio", "f_upper_ratio", "f_digit_ratio",
    "f_unique_ratio", "f_qmarks", "f_exclaims",
]


def classifier_pipeline(num_classes: int = 4):
    """M5+M7: TF-IDF ⊕ structural → LogisticRegression (single-label
    content-type classifier; the reference's predict_proba surface maps
    to probabilityCol)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=["tfidf"] + STRUCTURAL_COLS, outputCol="features"
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=30, regParam=0.01
    )
    return Pipeline(stages=[*tfidf_pipeline().getStages(), assembler, lr])


def train_content_classifier(spark: SparkSession, n_per_class: int = 200):
    """M9: deterministic 80/20 split (seed 42), returns (model, metrics).

    Metrics mirror the reference harness's report: accuracy + per-class
    counts (train_content_model.py:203-287)."""
    corpus = structural_features(synthetic_labeled_corpus(spark, n_per_class))
    train, test = corpus.randomSplit([0.8, 0.2], seed=42)
    model = classifier_pipeline().fit(train)
    pred = model.transform(test)
    agg = pred.select(
        (F.col("prediction") == F.col("label")).cast("int").alias("hit")
    ).agg(F.avg("hit").alias("accuracy"), F.count(F.lit(1)).alias("n_test"))
    row = agg.collect()[0]
    return model, {"accuracy": row.accuracy, "n_test": row.n_test}


def model_select_content_classifier(
    spark: SparkSession, n_per_class: int = 200, folds: int = 3, seed: int = 42
):
    """M9 — model selection: pyspark.ml CrossValidator +
    ParamGridBuilder over the full content pipeline with an f1
    evaluator, mirroring the reference harness's
    GridSearchCV(scoring='f1_macro') + cross_validate
    (ml/training/train_content_model.py:203-229). Seeded fold
    assignment → deterministic selection.

    Grid: LogisticRegression regParam x elasticNetParam (2x2). Each
    fold refits the whole pipeline (TF-IDF included), so no
    train/validation leakage through the IDF statistics — the same
    property sklearn's Pipeline-inside-GridSearchCV gives the
    reference. Returns (CrossValidatorModel, report) where report
    carries the per-candidate averaged f1 and the winning params."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    pipe = classifier_pipeline()
    lr = pipe.getStages()[-1]
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.01, 0.5])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    evaluator = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="f1"
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        numFolds=folds,
        seed=seed,
        parallelism=2,
    )
    corpus = structural_features(synthetic_labeled_corpus(spark, n_per_class))
    model = cv.fit(corpus)
    best_lr = model.bestModel.stages[-1]
    avg = [round(float(m), 6) for m in model.avgMetrics]
    return model, {
        "avg_f1": avg,
        "best_f1": max(avg),
        "best": {
            "regParam": best_lr.getRegParam(),
            "elasticNetParam": best_lr.getElasticNetParam(),
        },
    }


def predict_content_type(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """M7/M8: batch predict — (doc_id, predicted_class, probability)."""
    from pyspark.ml.functions import vector_to_array

    classes = list(CLASS_KEYWORDS)
    with_feats = structural_features(docs.withColumnRenamed(text_col, "text"))
    pred = model.transform(with_feats)
    label_arr = F.array(*[F.lit(c) for c in classes])
    return pred.select(
        "doc_id",
        F.element_at(label_arr, F.col("prediction").cast("int") + 1).alias(
            "predicted_class"
        ),
        F.round(F.array_max(vector_to_array("probability")), 6).alias("confidence"),
    )


# ---------------------------------------------------------------------------
# M6 — multi-label domain classifier (one-vs-rest)
# ---------------------------------------------------------------------------
#
# Reference (core/classifier.py:138-249): OneVsRest over the legal
# domains; predict returns the labels where ŷᵢ=1 plus per-label
# probabilities sorted descending. pyspark.ml's OneVsRest is argmax
# single-label, so true multi-label OvR is expressed directly: one
# binary LogisticRegression per domain over a SHARED feature transform
# (featurize once, N cheap heads — the 100 TB shape, since the TF-IDF
# pass dominates and runs a single time).

DOMAIN_KEYWORDS = {
    "family": ["marriage", "divorce", "custody", "dowry", "spouse", "alimony"],
    "criminal": ["crime", "penalty", "theft", "verdict", "prison", "felony"],
    "commercial": ["contract", "company", "cheque", "trade", "bankruptcy", "share"],
    "civil": ["property", "deed", "inheritance", "tenant", "damages", "ownership"],
}


def synthetic_multilabel_corpus(spark: SparkSession, n_samples: int = 400) -> DataFrame:
    """Deterministic corpus where ~1/3 of samples carry TWO domains —
    (sample_id, text, labels array<string> sorted)."""
    from .functions.url import hash60

    domains = list(DOMAIN_KEYWORDS)
    nd = len(domains)
    base = spark.range(n_samples).select(F.col("id").alias("sample_id"))
    h = hash60(F.concat(F.lit("ml:"), F.col("sample_id").cast("string")))
    d1 = F.pmod(h, nd)
    d2 = F.pmod(F.shiftright(h, 7), nd)
    two = (F.pmod(F.shiftright(h, 17), 3) == 0) & (d1 != d2)
    dom_arr = F.array(*[F.lit(d) for d in domains])
    name1 = F.element_at(dom_arr, (d1 + 1).cast("int"))
    name2 = F.element_at(dom_arr, (d2 + 1).cast("int"))
    labels = F.array_sort(
        F.when(two, F.array(name1, name2)).otherwise(F.array(name1))
    )

    def words_for(didx, shift, count):
        out = []
        for i in range(count):
            kw_arr = F.array(
                *[
                    F.element_at(
                        F.array(*[F.lit(k) for k in DOMAIN_KEYWORDS[d]]),
                        (F.pmod(F.shiftright(h, shift + 3 * i), 6) + 1).cast("int"),
                    )
                    for d in domains
                ]
            )
            out.append(F.element_at(kw_arr, (didx + 1).cast("int")))
        return out

    w1 = words_for(d1, 20, 5)
    w2 = [F.when(two, w).otherwise(F.lit("")) for w in words_for(d2, 37, 5)]
    filler = F.element_at(
        F.array(*[F.lit(s) for s in STOPWORDS[:8]]), (F.pmod(h, 8) + 1).cast("int")
    )
    text = F.concat_ws(" ", filler, *w1, *w2)
    return base.select(
        "sample_id", F.trim(F.regexp_replace(text, r"\s+", " ")).alias("text"),
        labels.alias("labels"),
    )


def train_domain_classifier(spark: SparkSession, n_samples: int = 400):
    """M6+M9: fit the shared featurizer once, then one binary LR head
    per domain. Returns (feature_model, {domain: lr_model})."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    corpus = structural_features(synthetic_multilabel_corpus(spark, n_samples))
    feats = Pipeline(
        stages=[
            *tfidf_pipeline().getStages(),
            VectorAssembler(inputCols=["tfidf"] + STRUCTURAL_COLS, outputCol="features"),
        ]
    ).fit(corpus)
    train = feats.transform(corpus).select("sample_id", "labels", "features").cache()
    heads = {}
    for dom in DOMAIN_KEYWORDS:
        labeled = train.withColumn(
            "label", F.array_contains("labels", dom).cast("double")
        )
        heads[dom] = LogisticRegression(
            featuresCol="features", labelCol="label", maxIter=30, regParam=0.01
        ).fit(labeled)
    train.unpersist()
    return feats, heads


def predict_domains(
    feature_model, heads: dict, docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """M6 predict surface: (id, domains array<string>, probs) — labels
    where p>threshold, sorted by probability descending (classifier.py:
    200-249 semantics). One feature pass + N head transforms."""
    from pyspark.ml.functions import vector_to_array

    pred = feature_model.transform(structural_features(docs))
    prob_cols = []
    for dom, model in heads.items():
        m = (
            model.copy()
            .setPredictionCol(f"__p_{dom}")
            .setProbabilityCol(f"__prob_{dom}")
            .setRawPredictionCol(f"__raw_{dom}")
        )
        pred = m.transform(pred)
        prob_cols.append(
            F.struct(
                F.round(vector_to_array(f"__prob_{dom}")[1], 6).alias("p"),
                F.lit(dom).alias("domain"),
            )
        )
    scored = F.reverse(F.array_sort(F.array(*prob_cols)))
    keep = F.filter(scored, lambda s: s["p"] > threshold)
    id_cols = [c for c in ("sample_id", "doc_id") if c in docs.columns]
    return pred.select(
        *id_cols,
        F.transform(keep, lambda s: s["domain"]).alias("domains"),
        F.transform(scored, lambda s: s["p"]).alias("probs"),
    )


# ---------------------------------------------------------------------------
# M10 — incremental model update (the partial_fit seam)
# ---------------------------------------------------------------------------
#
# Reference (utils/ml.py:109-133): partial_fit for incremental model
# updates. LogisticRegression can't merge, but a multinomial Naive
# Bayes over token counts can — EXACTLY: the sufficient statistics are
# additive count tables, so update(counts, new_batch) ≡ fit(old ∪ new)
# row-for-row. The count table is a DataFrame (scales; merge is a
# union + re-aggregate with map-side partials).

_DOC_MARK = "__doc__"


def nb_fit(docs: DataFrame, text_col: str = "text", label_col: str = "label_str") -> DataFrame:
    """Sufficient statistics: (label, term, n) token counts, plus one
    (label, '__doc__', n_docs) row per label."""
    tok = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")).alias("term"),
    )
    terms = tok.groupBy("label", "term").agg(F.count(F.lit(1)).alias("n"))
    docs_n = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    ).withColumn("term", F.lit(_DOC_MARK)).select("label", "term", "n")
    return terms.unionByName(docs_n)


def nb_update(counts: DataFrame, new_docs: DataFrame, **kw) -> DataFrame:
    """partial_fit: merge new sufficient statistics — exact (additive)."""
    return (
        counts.unionByName(nb_fit(new_docs, **kw))
        .groupBy("label", "term")
        .agg(F.sum("n").alias("n"))
    )


def nb_predict(counts: DataFrame, docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, predicted_label): argmax over log P(l) + Σ log P(t|l) with
    add-1 smoothing. Shape: explode tokens once, join the (broadcast-
    able) count table, aggregate per (doc, label); unseen terms enter
    through the closed-form (n_tokens − seen) × log(1/(total+V))."""
    doc_rows = counts.filter(F.col("term") == _DOC_MARK).select(
        "label", F.col("n").alias("n_docs")
    )
    term_counts = counts.filter(F.col("term") != _DOC_MARK)
    totals = term_counts.groupBy("label").agg(F.sum("n").alias("total"))
    vocab_n = term_counts.select("term").distinct().count()
    label_dim = F.broadcast(
        doc_rows.join(totals, "label").withColumn(
            "log_prior",
            F.log(F.col("n_docs"))  # shared denominator cancels in argmax
        )
    )

    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")).alias("term"),
    )
    per_doc = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_tok = per_doc.groupBy("id").agg(F.sum("tf").alias("n_tokens"))

    seen = (
        per_doc.join(term_counts, "term")
        .groupBy("id", "label")
        .agg(F.sum(F.col("tf") * F.log(F.col("n") + 1)).alias("seen_num"))
    )
    # cross every doc with every label so zero-overlap labels still score
    scored = (
        n_tok.crossJoin(F.broadcast(label_dim.select("label")))
        .join(seen, ["id", "label"], "left")
        .join(label_dim, "label")
        .withColumn(
            # unseen terms contribute tf·log(0+1) = 0, so only the
            # shared −n_tokens·log(total+V) denominator and the seen
            # numerator survive
            "score",
            F.col("log_prior")
            + F.coalesce(F.col("seen_num"), F.lit(0.0))
            - F.col("n_tokens") * F.log(F.col("total") + vocab_n),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("label").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("id").alias(id_col), F.col("label").alias("predicted_label"))
    )


def keyword_domain_features(
    docs: DataFrame, domains: dict[str, list[str]] | None = None
) -> DataFrame:
    """M2: per-domain keyword frequency (count / n_keywords), row-
    normalized — pure columns, \\b-bounded like the reference."""
    domains = domains or {
        k: v for k, v in list(CLASS_KEYWORDS.items())[:3]
    }
    t = F.lower(F.col("text"))
    feats = {}
    for dom, kws in domains.items():
        cnt = None
        for kw in kws:
            c = F.size(F.split(t, rf"\b{kw}\b")) - 1
            cnt = c if cnt is None else cnt + c
        feats[f"kw_{dom}"] = (cnt / float(len(kws))).cast("double")
    out = docs.withColumns(feats)
    total = None
    for name in feats:
        total = F.col(name) if total is None else total + F.col(name)
    norm = {
        name: F.round(
            F.when(total > 0, F.col(name) / total).otherwise(0.0), 6
        )
        for name in feats
    }
    return out.withColumns(norm)
