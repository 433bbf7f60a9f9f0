"""Core utilities: config, stats/timers, logging, caches, thread dispatch,
cameras. Counterpart of the reference's `Path-Tracing/Core/` layer (L1)."""

from pt.core.config import Config
from pt.core.stats import Stats, Timer, MaxTimer
from pt.core.cache import LRUCache, fnv1a
from pt.core.threads import ThreadDispatch
