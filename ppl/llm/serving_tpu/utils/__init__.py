from .hashing import hash_page, hash_prefix_pages
from .index_manager import IndexManager
from .page_manager import PageManager
from .prefix_cache import PrefixCacheManager
from .scheduler import RequestScheduler
from .detokenizer import StreamDetokenizer
from .timing import TimingGuard, now_us

__all__ = [
    "hash_page",
    "hash_prefix_pages",
    "IndexManager",
    "PageManager",
    "PrefixCacheManager",
    "RequestScheduler",
    "StreamDetokenizer",
    "TimingGuard",
    "now_us",
]
