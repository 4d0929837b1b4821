"""Skew exhibit correctness (round-5): the engine must stay CORRECT
when one mega-host owns ~50% of all URLs and one duplicate cluster
owns ~10% of all docs — the frontier's politeness/priority rules,
the seen set, and the dedup star-collapse must produce exactly the
sequential oracle's answers on the skewed fixture, not just on the
friendly uniform one. (The <1.5x wave-time-inflation measurement
lives in ``bench.py --skew``; this file pins the semantics.)"""

import pandas as pd
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fixture_skew(tmp_path_factory):
    from crawler_ray.fixtures import generate, write_fixture
    d = tmp_path_factory.mktemp("fix") / "skew"
    path = write_fixture(str(d), "t1", n_pages=600, n_hosts=8,
                         mega_host_share=0.5, dup_cluster_share=0.10)
    web = generate("t1", n_pages=600, n_hosts=8,
                   mega_host_share=0.5, dup_cluster_share=0.10)
    counts = [len(h.details) for h in web.hosts]
    assert counts[0] / sum(counts) > 0.45        # the mega host is real
    n_dup = sum(1 for h in web.hosts for dd in h.details
                if dd.title == "Decision cluster-0 on cookies")
    assert n_dup / sum(counts) > 0.07            # the dup cluster is real
    return path


@pytest.fixture(scope="module")
def oracle_skew(fixture_skew):
    from crawler_ray.oracle import crawl_oracle
    return crawl_oracle(pq.read_table(f"{fixture_skew}/pages.parquet"),
                        pq.read_table(f"{fixture_skew}/seeds.parquet"),
                        pq.read_table(f"{fixture_skew}/robots.parquet"))


@pytest.fixture(scope="module")
def crawl_skew(ray_session, fixture_skew, tmp_path_factory):
    from crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
    out = str(tmp_path_factory.mktemp("crawl") / "out")
    summary = run_crawl(f"{fixture_skew}/pages.parquet",
                        f"{fixture_skew}/seeds.parquet",
                        f"{fixture_skew}/robots.parquet",
                        out, CrawlConfig(n_frontier_shards=2,
                                         n_seen_shards=2, n_page_shards=2))
    return out, summary


def test_skew_crawl_matches_oracle(crawl_skew, oracle_skew):
    from crawler_ray.pipelines.crawl import crawl_log_dataset
    out, summary = crawl_skew
    log = crawl_log_dataset(out).to_pandas()
    assert set(log["url"]) == oracle_skew.seen
    assert summary["frontier_remaining"] == 0
    olog = pd.DataFrame(oracle_skew.crawl_log)
    assert len(log) == len(olog)
    for col in ["pop_rank", "url", "wave", "window"]:
        assert (log[col].values == olog[col].values).all(), col


def test_skew_dup_cluster_dedup(crawl_skew, oracle_skew):
    """The 10% dup cluster (one title+date shared across hosts) must
    collapse to exactly the oracle's doc set under the composite-key
    rule — the earliest fetch wins, every later member drops."""
    from crawler_ray.pipelines.crawl import finalize_docs
    out, _ = crawl_skew
    docs = finalize_docs(out).to_pandas()
    odocs = pd.DataFrame(oracle_skew.docs)
    odocs["doc_key"] = [r.doc_hash + "-" + r.release_date.isoformat()
                        for r in odocs.itertuples()]
    assert set(docs["doc_key"]) == set(odocs["doc_key"])
    assert len(docs) == len(odocs)
    cluster = docs[docs["title"] == "Decision cluster-0 on cookies"]
    assert len(cluster) == 1                     # collapsed to one keeper


def test_mega_dup_cluster_components(ray_session, tmp_path_factory):
    """dedup components on a documents table where ONE near-dup
    cluster owns 10% of all docs: the star-collapse in the LSH
    candidate stage must keep the mega bucket linear AND still
    produce one connected component covering exactly the cluster."""
    import ray.data as rd

    from crawler_ray.dedup import dup_components, minhash_lsh_pairs
    from crawler_ray.fixtures import write_documents_fixture
    d = tmp_path_factory.mktemp("docs") / "skewdocs"
    write_documents_fixture(str(d), n_docs=600, dup_cluster_share=0.10)
    docs = rd.read_parquet(f"{d}/documents.parquet",
                           columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.7)
    ids = rd.read_parquet(f"{d}/documents.parquet", columns=["doc_id"])
    comp = dup_components(pairs, ids).to_pandas()
    cluster_ids = set(range(60))                 # first 10% of 600
    labels = comp[comp["doc_id"].isin(cluster_ids)]["component"]
    assert labels.nunique() == 1                 # one component, not split
    outside = comp[(comp["component"] == labels.iloc[0])
                   & (~comp["doc_id"].isin(cluster_ids))]
    assert len(outside) == 0                     # and nothing foreign joined
