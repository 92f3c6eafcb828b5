from .keys import surrogate_key
from .dates import (
    date_key, weekday_name, is_weekend, week_number, date_spine,
)
from .strings import split_part_compat, slugify

__all__ = [
    "surrogate_key", "date_key", "weekday_name", "is_weekend",
    "week_number", "date_spine", "split_part_compat", "slugify",
]
