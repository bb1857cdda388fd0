"""IIDR entry-type (A_ENTTYP) → CDC operation mapping.

Parity with the reference's EntryTypeMapper.java:20-37 / CdcOperation.java:
6-11: insert-ish codes map to UPSERT deliberately (idempotent replay ⇒
exactly-once effect over at-least-once delivery), delete codes to DELETE,
anything else is corrupt. Trim + uppercase before matching
(EntryTypeMapper.java:49).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: PT=refresh put, RR=refresh replace, PX=?, UP=update, FI/FP=insert forms,
#: UR=update replace — all applied as idempotent keyed UPSERT.
UPSERT_CODES = ("PT", "RR", "PX", "UP", "FI", "FP", "UR")
#: DL=delete, DR=delete replace — applied as keyed DELETE.
DELETE_CODES = ("DL", "DR")

OP_UPSERT = "upsert"
OP_DELETE = "delete"
OP_CORRUPT = "corrupt"


def map_entry_type(entry_type: Column | str) -> Column:
    """Column expression mapping an A_ENTTYP code to upsert/delete/corrupt."""
    c = F.col(entry_type) if isinstance(entry_type, str) else entry_type
    norm = F.upper(F.trim(c))
    return (
        F.when(norm.isin(*UPSERT_CODES), F.lit(OP_UPSERT))
        .when(norm.isin(*DELETE_CODES), F.lit(OP_DELETE))
        .otherwise(F.lit(OP_CORRUPT))
    )
