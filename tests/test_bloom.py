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
