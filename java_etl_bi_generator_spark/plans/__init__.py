"""Physical-plan introspection helpers (used by tests to pin the plans we
want: pushdown reaching the scan, broadcast joins staying broadcast,
top-k planning as TakeOrderedAndProject)."""

from .plan_tools import (
    explain_formatted,
    explain_simple,
    plan_contains,
    scan_read_schemas,
)

__all__ = [
    "explain_formatted",
    "explain_simple",
    "plan_contains",
    "scan_read_schemas",
]
