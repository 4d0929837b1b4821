"""Translation cost-metering stage (ST5 analogue): price model,
budget grant/terminate, logical quota windows."""

import pyarrow as pa
import pytest


def _batch(texts):
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_unlimited_budget_translates_all(ray_session):
    import ray

    from crawler_ray.stages.translate import (MeteredTranslateStage,
                                              make_cost_meter)
    meter = make_cost_meter(budget_usd=0.0)           # 0 = unlimited
    st = MeteredTranslateStage(meter, "en")
    out = st(_batch(["hej", "bonjour", "hallo"]))
    assert out["translated"].to_pylist() == [True] * 3
    assert out["translated_text"].to_pylist() == [
        "[en] hej", "[en] bonjour", "[en] hallo"]
    stats = ray.get(meter.stats.remote())
    assert stats["spent_chars"] == len("hej") + len("bonjour") + len("hallo")


def test_budget_terminates_prefix(ray_session):
    import ray

    from crawler_ray.stages.translate import (MeteredTranslateStage,
                                              make_cost_meter)
    # PBMT = $20 / 1M chars → $0.0002 funds exactly 10 chars
    meter = make_cost_meter(budget_usd=0.0002)
    st = MeteredTranslateStage(meter, "fr")
    out = st(_batch(["abcdef", "ghi", "jklmno"]))     # 6 + 3 + 6 chars
    # 6+3 = 9 funded; the third row would need 15 > 10
    assert out["translated"].to_pylist() == [True, True, False]
    assert out["translated_text"].to_pylist()[2] is None
    stats = ray.get(meter.stats.remote())
    # mid-row tail refunded: spend reflects chars actually translated
    assert stats["spent_chars"] == 9
    assert stats["spent_usd"] <= 0.0002


def test_strict_raises_like_reference(ray_session):
    from crawler_ray.stages.translate import (BudgetExceededError,
                                              MeteredTranslateStage,
                                              make_cost_meter)
    meter = make_cost_meter(budget_usd=0.0002)
    st = MeteredTranslateStage(meter, "de", strict=True)
    with pytest.raises(BudgetExceededError):
        st(_batch(["x" * 50]))


def test_quota_window_resets(ray_session):
    import ray

    from crawler_ray.stages.translate import (MeteredTranslateStage,
                                              make_cost_meter)
    meter = make_cost_meter(budget_usd=0.0, window_chars=10)
    st = MeteredTranslateStage(meter, "en")
    st(_batch(["a" * 25]))                            # 25 chars / 10-char window
    stats = ray.get(meter.stats.remote())
    assert stats["window_resets"] == 2                # two logical 100-s waits


def test_dataset_integration(ray_session):
    import ray

    from crawler_ray.stages.translate import (MeteredTranslateStage,
                                              make_cost_meter)
    meter = make_cost_meter(budget_usd=0.0)
    ds = ray.data.from_arrow(_batch(["uno", "dos", "tres", "cuatro"]))
    out = (ds.map_batches(MeteredTranslateStage, batch_format="pyarrow",
                          fn_constructor_args=(meter, "en"), concurrency=2)
           .to_pandas().sort_values("doc_id"))
    assert list(out["translated_text"]) == [
        "[en] uno", "[en] dos", "[en] tres", "[en] cuatro"]


def test_null_text_rows_do_not_corrupt_budget(ray_session):
    """Regression (round-2 advice): a null text row used to turn the
    batch char total into INT64_MIN via NaN→astype, corrupting the
    shared budget debit."""
    import pyarrow as pa
    import ray

    from crawler_ray.stages.translate import (
        MeteredTranslateStage, make_cost_meter)
    meter = make_cost_meter(budget_usd=0.0)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hello", None, "world!"], pa.string()),
    }))
    out = ds.map_batches(
        MeteredTranslateStage, batch_format="pyarrow",
        fn_constructor_kwargs={"meter": meter, "target_language": "de"},
        concurrency=1).to_pandas().sort_values("doc_id")
    assert out["n_chars"].tolist() == [5, 0, 6]
    assert out["translated"].all()
    stats = ray.get(meter.stats.remote())
    assert stats["spent_chars"] == 11
