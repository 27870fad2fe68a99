"""M9 — model-selection harness: CrossValidator + ParamGridBuilder
(f1) over the content classifier, mirroring the reference's
GridSearchCV(f1_macro) + cross_validate
(ml/training/train_content_model.py:203-229). Seeded → the selected
hyper-parameters are deterministic."""

from crawler_spark.ml import model_select_content_classifier


def test_cv_selects_expected_params(spark):
    model, report = model_select_content_classifier(spark, n_per_class=60)
    # 2x2 grid -> 4 averaged fold metrics
    assert len(report["avg_f1"]) == 4
    # the lightly-regularized ridge model must beat the heavily
    # regularized variants on the separable synthetic corpus
    assert report["best"]["regParam"] == 0.01
    assert report["best"]["elasticNetParam"] == 0.0
    assert report["best_f1"] >= 0.8
    assert report["best_f1"] == max(report["avg_f1"])


def test_cv_is_deterministic(spark):
    _, r1 = model_select_content_classifier(spark, n_per_class=40, folds=2)
    _, r2 = model_select_content_classifier(spark, n_per_class=40, folds=2)
    assert r1["avg_f1"] == r2["avg_f1"]
    assert r1["best"] == r2["best"]
