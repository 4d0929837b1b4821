"""Translation cost-metering stage (ST5 analogue).

The reference meters Google Translate usage while walking docs
sequentially: a $/char price model (``pygdpr/services/
translate_price_service.py:10-11``), per-window character quotas
(``translate_quota_service.py:8-31``), a price-terminate predicate
that raises once the aggregate estimate exceeds a budget
(``models/dpa/__init__.py`` ``translate_docs``:
``PriceTerminateTranslateSpecification`` →
``GoogleTranslatePriceError``), and a 100-second quota window that
resets the running character count.

Engine version, Ray-Data-native:

- ``CostMeter`` — ONE named actor holding the aggregate spend. Stages
  debit it **once per batch** (not per row), so the actor sees
  ~#batches calls, and a grant is atomic: concurrent batches can
  never jointly overshoot the budget. At much larger scale the meter
  shards like the seen set (debit against ``shard = hash(task) % n``
  of a pre-split budget); one actor is correct here because the call
  rate is per-batch.
- ``MeteredTranslateStage`` — a callable class for
  ``map_batches(..., concurrency=N)``. Per batch: vectorized char
  counts, one ``debit``; rows past the granted character budget are
  emitted with ``translated=False`` (deterministic per-row outcome —
  the streaming-friendly form of the reference's mid-walk raise);
  ``strict=True`` raises :class:`BudgetExceededError` instead, which
  Ray propagates and fails the pipeline like the reference's
  ``GoogleTranslatePriceError``.
- the actual API call has no sandbox analogue (network) — the
  default ``translate_fn`` is a deterministic stub tagging the text
  with the target language; swap in a real client per actor via the
  constructor.

Quota windows are *logical* (counted, never slept), like the crawl's
politeness rounds: the meter reports ``window_resets`` = how many
100-second waits the reference would have inserted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["TRANSLATE_PRICE_PER_M", "TRANSLATE_QUOTA", "CostMeter",
           "MeteredTranslateStage", "BudgetExceededError", "make_cost_meter",
           "fake_translate"]

# $ per 10^6 characters — translate_price_service.py:4-8
TRANSLATE_PRICE_PER_M = {"PBMT": 20.0, "NMT": 20.0, "AutoML": 80.0}

# character quotas — translate_quota_service.py:9-12
TRANSLATE_QUOTA = {
    "chars_per_day": 10 ** 9,
    "chars_per_100_secs": 10 ** 6,
    "chars_per_100_secs_per_user": 10 ** 4,
}


class BudgetExceededError(RuntimeError):
    """Engine analogue of the reference's GoogleTranslatePriceError."""


@ray.remote
class CostMeter:
    """Aggregate spend + logical quota-window state."""

    def __init__(self, budget_usd: float = 0.0,
                 price_per_m: float = TRANSLATE_PRICE_PER_M["PBMT"],
                 window_chars: int =
                 TRANSLATE_QUOTA["chars_per_100_secs_per_user"]):
        self.budget_usd = budget_usd          # 0.0 = unlimited (reference
        self.price_per_m = price_per_m        # price_terminate_usd semantics)
        self.window_chars = window_chars
        self.spent_chars = 0
        self.window_used = 0
        self.window_resets = 0

    def debit(self, n_chars: int) -> int:
        """Atomically grant up to ``n_chars`` against the remaining
        budget; returns granted chars (< n_chars once the budget
        trips). Also rolls the logical 100-sec quota window."""
        if self.budget_usd <= 0.0:
            grant = int(n_chars)
        else:
            budget_chars = int(self.budget_usd / self.price_per_m * 1e6)
            grant = max(0, min(int(n_chars),
                               budget_chars - self.spent_chars))
        self.spent_chars += grant
        self.window_used += grant
        while self.window_used > self.window_chars:
            self.window_used -= self.window_chars
            self.window_resets += 1           # the reference sleeps 105 s here
        return grant

    def refund(self, n_chars: int) -> None:
        """Return the tail of a grant that cut a batch mid-row (the
        stage funds whole rows only) so ``spent_usd`` reflects chars
        actually translated, like the reference's per-doc pre-check."""
        self.spent_chars -= int(n_chars)
        self.window_used = max(0, self.window_used - int(n_chars))

    def stats(self) -> dict:
        return {"spent_chars": self.spent_chars,
                "spent_usd": self.spent_chars / 1e6 * self.price_per_m,
                "window_resets": self.window_resets,
                "budget_usd": self.budget_usd}


def make_cost_meter(budget_usd: float = 0.0,
                    price_per_m: float = TRANSLATE_PRICE_PER_M["PBMT"],
                    window_chars: int =
                    TRANSLATE_QUOTA["chars_per_100_secs_per_user"]):
    return CostMeter.options(max_concurrency=1).remote(
        budget_usd, price_per_m, window_chars)


def fake_translate(text: str, target_language: str) -> str:
    """Deterministic sandbox stand-in for the translate API call
    (no network). Real deployments pass a client-backed callable."""
    return f"[{target_language}] {text}"


class MeteredTranslateStage:
    """``map_batches`` actor stage: translate ``text`` into one target
    language under the shared budget. Emits the input id column,
    ``target_lang``, ``translated`` (False once the budget tripped)
    and ``translated_text`` (None for unfunded rows)."""

    def __init__(self, meter, target_language: str,
                 translate_fn=None, id_col: str = "doc_id",
                 text_col: str = "text", strict: bool = False):
        self.meter = meter
        self.lang = target_language
        self.fn = translate_fn or fake_translate
        self.id_col, self.text_col = id_col, text_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        # fill_null BEFORE the numpy cast: a null text row would yield
        # NaN → INT64_MIN under astype, corrupting the batch char total
        # and debiting garbage against the shared budget
        lens = pc.fill_null(pc.utf8_length(batch[self.text_col]), 0
                            ).to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(lens.sum())
        granted = ray.get(self.meter.debit.remote(total))
        # fund whole rows in order until the grant runs out (prefix by
        # cumulative chars — deterministic within the batch)
        funded = np.cumsum(lens) <= granted
        used = int(lens[funded].sum())
        if used < granted:
            self.meter.refund.remote(granted - used)
        if self.strict and not funded.all():
            raise BudgetExceededError(
                f"translate budget exhausted ({total - granted} chars "
                f"unfunded in batch)")
        texts = batch[self.text_col].to_pylist()
        out = [self.fn(t or "", self.lang) if ok else None
               for t, ok in zip(texts, funded)]
        return pa.table({
            self.id_col: batch[self.id_col],
            "target_lang": pa.array([self.lang] * batch.num_rows,
                                    pa.string()),
            "translated": pa.array(funded, pa.bool_()),
            "translated_text": pa.array(out, pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
        })
