"""Native (C++) host-runtime selection.

The C++ extension (native/ppl_llm_host.cpp) provides drop-in replacements
for IndexManager / PageManager / PrefixCacheManager. It is used
automatically when built (``make -C native``); set
``PPL_LLM_DISABLE_NATIVE=1`` to force the pure-Python implementations
(they are the behavioral reference, exercised by the same test suite).
"""

from __future__ import annotations

import os

_native = None
if os.environ.get("PPL_LLM_DISABLE_NATIVE") != "1":
    try:
        from . import ppl_llm_host as _native  # type: ignore
    except ImportError:
        try:
            import ppl_llm_host as _native  # type: ignore
        except ImportError:
            _native = None

HAVE_NATIVE = _native is not None


def get_index_manager_cls():
    if HAVE_NATIVE:
        return _native.IndexManager
    from .index_manager import IndexManager
    return IndexManager


def get_page_manager_cls():
    if HAVE_NATIVE:
        return _native.PageManager
    from .page_manager import PageManager
    return PageManager


def get_prefix_cache_cls():
    if HAVE_NATIVE:
        return _native.PrefixCacheManager
    from .prefix_cache import PrefixCacheManager
    return PrefixCacheManager
