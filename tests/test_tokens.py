"""OAuth token broker (ST5): single-flight mint, expiry refresh,
worker-local caching."""

import pyarrow as pa
import pytest


def test_broker_single_mint_and_refresh(ray_session):
    import ray

    from crawler_ray.sources.tokens import make_token_broker

    broker = make_token_broker()
    tok1, exp1 = ray.get(broker.get.remote(now=1000.0))
    tok2, _ = ray.get(broker.get.remote(now=1001.0))
    assert tok1 == tok2 == "token-0001"           # second call reuses
    assert exp1 == 1000.0 + 3600.0
    # inside the refresh margin → re-mint
    tok3, exp3 = ray.get(broker.get.remote(now=exp1 - 10))
    assert tok3 == "token-0002" and exp3 > exp1
    assert ray.get(broker.stats.remote())["mints"] == 2


def test_stage_caches_token_locally(ray_session):
    import ray

    from crawler_ray.sources.tokens import BearerFetchStage, make_token_broker
    broker = make_token_broker()
    st = BearerFetchStage(broker)
    for i in range(5):
        out = st(pa.table({"url": pa.array([f"https://api.example/{i}"],
                                           pa.string())}))
    assert st.broker_calls == 1                   # one round trip, 5 batches
    assert out["body"][0].as_py() \
        == "https://api.example/4|Bearer token-0001"
    assert ray.get(broker.stats.remote())["mints"] == 1


def test_concurrent_workers_never_double_mint(ray_session):
    import ray

    from crawler_ray.sources.tokens import BearerFetchStage, make_token_broker
    broker = make_token_broker()
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array([f"https://api.example/{i}" for i in range(64)],
                        pa.string())}))
    out = (ds.map_batches(BearerFetchStage, batch_format="pyarrow",
                          fn_constructor_args=(broker,), batch_size=8,
                          concurrency=4)
           .to_pandas())
    assert len(out) == 64
    assert out["body"].str.endswith("Bearer token-0001").all()
    assert ray.get(broker.stats.remote())["mints"] == 1
