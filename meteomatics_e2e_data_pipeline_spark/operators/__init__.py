from .dedupe import latest_record_wins, dedupe_by_key
from .incremental import (
    new_files_only, upsert_by_key, read_target, full_refresh, append_only,
)
from .flatten import explode_path
from .asof import asof_join
from .rangejoin import interval_join
from .skew import salted_agg
from .bucketing import write_bucketed, cobucketed_join
from .neardup import minhash_signatures, near_dup_pairs, simhash
from .similarity import (
    cosine, knn_bruteforce, knn_ivf, cosine_near_dup_pairs,
)
from .textops import content_hash, lang_guess, normalize_text, tokens
from .multimodal import to_media_table, extract_features
from .maintenance import compact_parquet

__all__ = [
    "latest_record_wins", "dedupe_by_key", "new_files_only",
    "upsert_by_key", "read_target", "full_refresh", "append_only",
    "explode_path", "asof_join", "interval_join", "salted_agg",
    "write_bucketed", "cobucketed_join", "minhash_signatures",
    "near_dup_pairs", "simhash", "cosine", "knn_bruteforce", "knn_ivf",
    "cosine_near_dup_pairs", "content_hash", "lang_guess",
    "normalize_text", "tokens", "to_media_table", "extract_features",
    "compact_parquet",
]
