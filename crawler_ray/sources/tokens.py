"""Shared OAuth-token broker (ST5).

The reference's France scraper performs a client-credentials OAuth
exchange once per run and then stamps ``Bearer <token>`` on every
Legifrance API call (``pygdpr/models/dpa/france/__init__.py:64-84``
mint, ``:107-112`` use). In a distributed crawl the naive port — every
fetch worker minting its own token — would stampede the auth endpoint
and trip its rate limit, so the engine centralizes credentials:

- :class:`TokenBroker` — ONE named ``max_concurrency=1`` actor owning
  the credential. Refresh is single-flight *by construction*: however
  many workers ask at once, the actor serializes them and the first
  one past the expiry check mints; the rest read the fresh token.
- :class:`BearerFetchStage` — the actor-pool ``map_batches`` pattern
  for API-backed sources: each worker caches ``(token, expires_at)``
  locally and only calls the broker when its copy is within
  ``refresh_margin_s`` of expiry — one broker round trip per actor
  per token lifetime, not per batch.

The actual HTTP exchange has no sandbox analogue (no network): the
default ``mint_fn`` is a deterministic stub; deployments pass a
requests-backed callable with the same ``() -> (token,
ttl_seconds)`` contract. The clock is injectable so expiry behavior
is unit-testable without sleeping.
"""

from __future__ import annotations

import time

import pyarrow as pa
import ray

__all__ = ["TokenBroker", "BearerFetchStage", "make_token_broker",
           "fake_mint"]


def fake_mint(counter: int) -> tuple[str, float]:
    """Deterministic stand-in for the OAuth exchange (france:69-84):
    returns (access_token, ttl_seconds)."""
    return f"token-{counter:04d}", 3600.0


@ray.remote
class TokenBroker:
    """Owns one credential; mints lazily, refreshes when within
    ``refresh_margin_s`` of expiry."""

    def __init__(self, mint_fn=None, refresh_margin_s: float = 60.0,
                 clock=None):
        self._mint = mint_fn or fake_mint
        self.margin = refresh_margin_s
        self.clock = clock or time.time
        self.token: str | None = None
        self.expires_at = 0.0
        self.mints = 0

    def get(self, now: float | None = None) -> tuple[str, float]:
        """Valid (token, expires_at); refresh is serialized by the
        actor, so concurrent callers can never double-mint. ``now``
        overrides the actor's clock (tests / deterministic replays —
        a driver-side closure can't reach into the actor process)."""
        t = self.clock() if now is None else now
        if self.token is None or t >= self.expires_at - self.margin:
            self.mints += 1
            self.token, ttl = self._mint(self.mints)
            self.expires_at = t + ttl
        return self.token, self.expires_at

    def stats(self) -> dict:
        return {"mints": self.mints, "expires_at": self.expires_at}


def make_token_broker(mint_fn=None, refresh_margin_s: float = 60.0,
                      clock=None):
    # num_cpus=0: the broker holds a string and a float — reserving a
    # whole core for it can deadlock small clusters where the fetch
    # actor pool already claims every CPU
    return TokenBroker.options(max_concurrency=1, num_cpus=0).remote(
        mint_fn, refresh_margin_s, clock)


def _fake_api_fetch(url: str, headers: dict) -> str:
    """Sandbox stand-in for the authenticated POST
    (france:103-113); deployments pass a requests-backed callable."""
    auth = headers.get("Authorization", "")
    return f"{url}|{auth}"


class BearerFetchStage:
    """``map_batches`` actor stage: fetch each row's ``url`` with a
    broker-issued bearer token (locally cached until near expiry)."""

    def __init__(self, broker, fetch_fn=None,
                 refresh_margin_s: float = 30.0, clock=None,
                 url_col: str = "url"):
        self.broker = broker
        self.fetch = fetch_fn or _fake_api_fetch
        self.margin = refresh_margin_s
        self.clock = clock or time.time
        self.url_col = url_col
        self._token: str | None = None
        self._exp = 0.0
        self.broker_calls = 0

    def _bearer(self) -> str:
        if self._token is None or self.clock() >= self._exp - self.margin:
            self._token, self._exp = ray.get(self.broker.get.remote())
            self.broker_calls += 1
        return f"Bearer {self._token}"            # france:107

    def __call__(self, batch: pa.Table) -> pa.Table:
        bearer = self._bearer()                   # once per batch at most
        headers = {"Content-Type": "application/json",
                   "Authorization": bearer}
        bodies = [self.fetch(u, headers)
                  for u in batch[self.url_col].to_pylist()]
        return batch.append_column("body", pa.array(bodies, pa.string()))
