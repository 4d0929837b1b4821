"""Pure, vectorizable column functions shared by pipeline stages."""

from crawler_ray.functions.dates import (  # noqa: F401
    parse_date_multi, parse_dates_multi, retain_window, PINNED_NOW,
)
from crawler_ray.functions.hashing import (  # noqa: F401
    md5_hex, md5_hex_many, composite_doc_key, doc_key,
)
