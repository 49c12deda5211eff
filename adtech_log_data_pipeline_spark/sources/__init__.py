from .tables import TABLES, load_table, register_tables
from .bidlogs import bid_logs_cte, iapp_cte, load_bid_logs, load_iapp

__all__ = [
    "TABLES",
    "load_table",
    "register_tables",
    "bid_logs_cte",
    "iapp_cte",
    "load_bid_logs",
    "load_iapp",
]
