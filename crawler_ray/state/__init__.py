"""Stateful components: bloom filter, sharded URL-seen set, frontier
shards with per-host politeness token buckets and robots cache."""

import os


def current_rss_mb() -> float:
    """Resident set size of the calling process in MB (Linux /proc).

    Stateful actors report this from ``stats()`` so a long-horizon
    crawl can watch actor heap growth epoch over epoch — the leak
    check a 100-TB deployment runs continuously (an actor whose RSS
    grows faster than its state's logical size has a leak)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return round(pages * os.sysconf("SC_PAGE_SIZE") / 1e6, 1)
    except (OSError, ValueError, IndexError):   # non-Linux fallback
        return -1.0
