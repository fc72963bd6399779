"""System-column vocabulary and changelog operation codes.

Semantics match the ODF spec (reference:
`src/odf/metadata/src/dtos/dtos_generated.rs:1077` DatasetVocabulary,
`src/odf/metadata/src/data/operation_type.rs:14-19` OperationType).
Every dataset record carries four system columns:

- ``offset``      BIGINT NOT NULL — dense, sequential from 0, globally sorted
- ``op``          INT    NOT NULL — changelog operation (codes below)
- ``system_time`` TIMESTAMP       — ingestion wall-clock, monotonic per commit
- ``event_time``  TIMESTAMP       — domain time; watermark = running max
"""

from __future__ import annotations

from dataclasses import dataclass


class OperationType:
    """Changelog operation codes, stored as INT32 for engine compatibility
    (reference: writer.rs:249-251)."""

    APPEND = 0  # +A
    RETRACT = 1  # -R
    CORRECT_FROM = 2  # -C (old values of a corrected record)
    CORRECT_TO = 3  # +C (new values of a corrected record)

    _SYMBOLS = {APPEND: "+A", RETRACT: "-R", CORRECT_FROM: "-C", CORRECT_TO: "+C"}

    @classmethod
    def symbol(cls, code: int) -> str:
        return cls._SYMBOLS[code]


@dataclass(frozen=True)
class DatasetVocabulary:
    """Names of the system columns; overridable per dataset."""

    offset_column: str = "offset"
    operation_type_column: str = "op"
    system_time_column: str = "system_time"
    event_time_column: str = "event_time"

    def system_columns(self) -> list[str]:
        return [
            self.offset_column,
            self.operation_type_column,
            self.system_time_column,
            self.event_time_column,
        ]


DEFAULT_VOCAB = DatasetVocabulary()
