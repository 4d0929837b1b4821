"""Stateful components: bloom filter, sharded URL-seen set, frontier
shards with per-host politeness token buckets and robots cache."""
