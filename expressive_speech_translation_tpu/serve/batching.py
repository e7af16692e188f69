"""Micro-batching executor: concurrent requests → one MXU-shaped dispatch.

The reference serves every request alone (one ``inference_zero_shot`` per HTTP
call, Docker/cosyvoice_api.py:96-153), so GPU utilisation collapses under
concurrency. On TPU the fix is classic serving micro-batching: a collector
thread gathers requests for up to ``max_wait_ms`` (or until ``max_batch``),
runs ONE batched compiled program, and fans results back out to the waiting
callers. Batch sizes are bucketed (1/2/4/8/…) so the whole serving lifetime
touches a handful of compiled graphs.

This module is model-agnostic runtime infrastructure: it batches any
``run_batch: list[item] -> list[result]`` callable.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence

log = logging.getLogger(__name__)


# Re-export: the batch-bucket policy lives in core.buckets (pipeline code
# imports it from there so the model layer never depends on the HTTP layer);
# this name is kept for serve-side callers/tests.
from ..core.buckets import bucket_batch  # noqa: F401


class MicroBatcher:
    """Gathers submitted items into batches for a single runner callable.

    ``submit`` is thread-safe and returns a ``Future``. The collector thread
    blocks on the first item, then drains whatever arrives within
    ``max_wait_ms`` (up to ``max_batch``) — latency cost is bounded by the
    wait window, throughput gain is the batch width.
    """

    _SHUTDOWN = object()

    def __init__(
        self,
        run_batch: Callable[[List[Any]], List[Any]],
        *,
        max_batch: int = 8,
        max_wait_ms: float = 20.0,
        name: str = "microbatcher",
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._q: "queue.Queue[Any]" = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, name=name, daemon=True)
        self._thread.start()
        # served/batch counters — observability for the health endpoints
        self.n_items = 0
        self.n_batches = 0

    def submit(self, item: Any) -> Future:
        # atomic closed-check + enqueue: without the lock a submit racing
        # shutdown() can land behind the sentinel and its Future never
        # resolves (the caller's .result() blocks forever)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is shut down")
            fut: Future = Future()
            self._q.put((item, fut))
        return fut

    def __call__(self, item: Any) -> Any:
        """Synchronous convenience: submit and wait."""
        return self.submit(item).result()

    def shutdown(self, *, wait: bool = True) -> None:
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(self._SHUTDOWN)
        if wait:
            self._thread.join(timeout=30)

    def _collect(self) -> Optional[List[tuple]]:
        first = self._q.get()
        if first is self._SHUTDOWN:
            return None
        batch = [first]
        t_end = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = t_end - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is self._SHUTDOWN:
                self._q.put(self._SHUTDOWN)  # re-post for the outer loop
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            items = [it for it, _ in batch]
            futures = [f for _, f in batch]
            try:
                results = self._run_batch(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results for {len(items)} items"
                    )
            except Exception as e:  # noqa: BLE001 — fan the error out
                for f in futures:
                    if not f.done():
                        f.set_exception(e)
                continue
            self.n_items += len(items)
            self.n_batches += 1
            for f, r in zip(futures, results):
                if not f.done():
                    f.set_result(r)


class _BatchedEngine:
    """Shared facade machinery for the Batched* wrappers: constructor check,
    MicroBatcher wiring, weightless/stats forwarding, shutdown, and the
    streaming-bypass contract.

    Streaming methods (``_STREAM_ATTRS``) bypass the batcher — they own the
    device interactively — and are resolved through ``__getattr__`` so they
    exist on the facade ONLY when the inner engine has them: ``hasattr``
    gates on the wrapper stay honest (a class-level forwarder would make
    hasattr always-True and push every caller into an unreachable-fallback
    trap)."""

    _BATCH_ATTR = ""                       # e.g. "synthesize_batch"
    _STREAM_ATTRS: tuple = ()
    _NAME = "microbatch"

    def __init__(self, engine: Any, *, max_batch: int, max_wait_ms: float):
        run = getattr(engine, self._BATCH_ATTR, None)
        if run is None:
            raise TypeError(f"engine must expose {self._BATCH_ATTR}(requests)")
        self.engine = engine
        self._mb = MicroBatcher(
            run, max_batch=max_batch, max_wait_ms=max_wait_ms, name=self._NAME)

    def __getattr__(self, name: str):
        if name in self._STREAM_ATTRS:
            return getattr(self.engine, name)   # AttributeError when absent
        raise AttributeError(name)

    @property
    def weightless(self):
        """Forward the inner engine's weights state so weights-gated checks
        (cascaded.py empty-translation hard-fail, engines.weights_info) see
        through the batching facade."""
        return getattr(self.engine, "weightless", None)

    @property
    def stats(self) -> dict:
        return {"items": self._mb.n_items, "batches": self._mb.n_batches}

    def shutdown(self):
        self._mb.shutdown()


class BatchedTts(_BatchedEngine):
    """TtsEngine facade over a batch-capable engine + MicroBatcher.

    Drop-in for any single-request call site (``synthesize``) while coalescing
    concurrent callers into ``engine.synthesize_batch`` dispatches. Streaming
    requests bypass batching (they own the device interactively).
    """

    _BATCH_ATTR = "synthesize_batch"
    _STREAM_ATTRS = ("synthesize_streaming",)
    _NAME = "tts-microbatch"

    def __init__(self, engine: Any, *, max_batch: int = 8, max_wait_ms: float = 20.0):
        super().__init__(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)
        self.sample_rate = getattr(engine, "sample_rate", 24_000)

    def synthesize(self, text: str, *, style_prompt: str = "",
                   reference_audio_16k: Any = None, language: str = "en"):
        return self._mb({
            "text": text, "style_prompt": style_prompt,
            "reference_audio_16k": reference_audio_16k, "language": language,
        })


class BatchedAsr(_BatchedEngine):
    """AsrEngine facade over a batch-capable engine + MicroBatcher
    (counterpart of :class:`BatchedTts` for ``transcribe``)."""

    _BATCH_ATTR = "transcribe_batch"
    _STREAM_ATTRS = ("transcribe_streaming",)
    _NAME = "asr-microbatch"

    def __init__(self, engine: Any, *, max_batch: int = 8, max_wait_ms: float = 20.0):
        super().__init__(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def transcribe(self, audio_16k: Any, language: Optional[str] = None):
        return self._mb({"audio_16k": audio_16k, "language": language})


class BatchedNmt(_BatchedEngine):
    """NmtEngine facade over a batch-capable engine + MicroBatcher."""

    _BATCH_ATTR = "translate_batch"
    _NAME = "nmt-microbatch"

    def __init__(self, engine: Any, *, max_batch: int = 16, max_wait_ms: float = 10.0):
        super().__init__(engine, max_batch=max_batch, max_wait_ms=max_wait_ms)

    def translate(self, text: str, source_lang: str, target_lang: str) -> str:
        return self._mb({"text": text, "source_lang": source_lang,
                         "target_lang": target_lang})
