import numpy as np

from crawler_ray.state.bloom import BloomFilter


def test_no_false_negatives():
    bf = BloomFilter(5000)
    keys = np.random.default_rng(7).integers(0, 2 ** 63, 5000, dtype=np.uint64)
    bf.add(keys)
    assert bf.might_contain(keys).all()


def test_false_positive_rate_bounded():
    bf = BloomFilter(10_000)
    rng = np.random.default_rng(0)
    bf.add(rng.integers(0, 2 ** 63, 10_000, dtype=np.uint64))
    probe = rng.integers(2 ** 63, 2 ** 64 - 1, 50_000, dtype=np.uint64)
    fp = bf.might_contain(probe).mean()
    assert fp < 0.01, fp          # theory ~3e-3 at 12 bits/key


def test_empty_and_roundtrip():
    bf = BloomFilter(100)
    assert bf.might_contain(np.array([1, 2, 3], dtype=np.uint64)).sum() == 0
    bf.add(np.array([42], dtype=np.uint64))
    bf2 = BloomFilter.from_state(bf.state())
    assert bf2.might_contain(np.array([42], dtype=np.uint64)).all()
    assert bf2.count == bf.count


def test_cuckoo_filter_membership_and_delete():
    import numpy as np

    from crawler_ray.state.cuckoo import CuckooFilter
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    cf = CuckooFilter(10_000)
    cf.add(keys)
    # no false negatives
    assert cf.might_contain(keys).all()
    # false-positive rate bounded (~1.2e-4 nominal; allow 10x slack)
    probe = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    fresh = probe[~np.isin(probe, keys)]
    assert cf.might_contain(fresh).mean() < 1.2e-3
    # deletion (the cuckoo advantage over bloom)
    removed = cf.delete(keys[:100])
    assert removed.all()
    assert not cf.might_contain(keys[:100]).any() or \
        cf.might_contain(keys[:100]).mean() < 0.05   # residual FPs only
    # snapshot roundtrip
    cf2 = CuckooFilter.from_state(cf.state())
    assert cf2.might_contain(keys[100:200]).all()


def test_seen_shard_with_cuckoo(ray_session):
    import ray

    from crawler_ray.sources.pages import pack
    from crawler_ray.state.seen import SeenShard
    import pyarrow as pa
    s = SeenShard.remote(0, 1000, {}, "cuckoo")
    ray.get(s.set_frontier.remote([]))
    t = pa.table({
        "url": pa.array(["https://h/a"], pa.string()),
        "url_hash": pa.array([11], pa.uint64()),
        "host": pa.array(["h"], pa.string()),
        "depth": pa.array([0], pa.int32()),
        "parent_order": pa.array([-1], pa.int64()),
        "dom_idx": pa.array([0], pa.int32()),
    })
    ray.get(s.offer.remote(pack(t)))
    assert ray.get(s.commit_wave.remote()) == 1
    ray.get(s.offer.remote(pack(t)))
    assert ray.get(s.commit_wave.remote()) == 0     # dup via cuckoo+exact


# ---- signature table (exact membership, the seen-shard default) ---------

def test_sigtable_exact_membership():
    from crawler_ray.state.sigtable import SigTable
    rng = np.random.default_rng(11)
    keys = rng.integers(1, 2 ** 63, 20_000, dtype=np.uint64)
    st = SigTable(1000)                      # force several growths
    st.add(keys)
    assert st.contains(keys).all()           # no false negatives
    miss = rng.integers(2 ** 63, 2 ** 64 - 1, 50_000, dtype=np.uint64)
    assert not st.contains(miss).any()       # EXACT: zero false positives


def test_sigtable_incremental_and_duplicates():
    from crawler_ray.state.sigtable import SigTable
    rng = np.random.default_rng(5)
    st = SigTable(4096)
    seen = []
    for _ in range(20):
        batch = rng.integers(1, 2 ** 62, 500, dtype=np.uint64)
        st.add(batch)
        st.add(batch)                        # duplicate adds are no-ops
        seen.append(batch)
        allk = np.concatenate(seen)
        assert st.contains(allk).all()
    probe = rng.integers(2 ** 62, 2 ** 63, 10_000, dtype=np.uint64)
    truth = np.isin(probe, np.concatenate(seen))
    assert (st.contains(probe) == truth).all()


def test_sigtable_zero_key():
    # key 0 collides with the empty-slot sentinel: must be routed to
    # the overflow and never silently dropped (a lost seen-hash means
    # the crawl re-admits the url every wave, forever)
    from crawler_ray.state.sigtable import SigTable
    st = SigTable(64)
    assert not st.contains(np.array([0], dtype=np.uint64)).any()
    st.add(np.array([0, 7], dtype=np.uint64))
    assert st.contains(np.array([0, 7], dtype=np.uint64)).all()
    assert not st.contains(np.array([8], dtype=np.uint64)).any()
