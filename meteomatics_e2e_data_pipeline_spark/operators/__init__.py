from .dedupe import latest_record_wins, dedupe_by_key
from .incremental import (
    new_files_only, upsert_by_key, read_target, full_refresh, append_only,
)
from .flatten import explode_path

__all__ = [
    "latest_record_wins", "dedupe_by_key", "new_files_only",
    "upsert_by_key", "read_target", "full_refresh", "append_only",
    "explode_path",
]
