"""Manual watermark advance — a data-less commit
(reference: set_watermark_executor_impl.rs:34+, writer.rs:948-978)."""

from __future__ import annotations

from datetime import datetime, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.ledger import ChainIntegrityError


def set_watermark(
    dataset: Dataset,
    watermark: datetime,
    system_time: datetime | None = None,
) -> dict:
    """Commit an AddData block with no data, only a new watermark.
    Watermarks are monotonic; regressions raise."""
    if watermark.tzinfo is None:
        watermark = watermark.replace(tzinfo=timezone.utc)
    wm_iso = watermark.isoformat()
    prev = dataset.chain.current_watermark()
    if prev is not None and wm_iso < prev:
        raise ChainIntegrityError(
            f"watermark regression: {wm_iso} < {prev}"
        )
    system_time = system_time or datetime.now(timezone.utc)
    event = {"kind": "AddData", "new_data": None, "new_watermark": wm_iso}
    dataset.chain.append(event, system_time=system_time.isoformat())
    return event
