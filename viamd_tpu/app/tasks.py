"""Async task system: pooled tasks with progress, interruption, dependencies.

Capability mirror of src/task_system.{h,cpp} (reference: enkiTS wrapper —
256-slot pool, range tasks, dependencies, interrupt flags, progress
fractions, main-thread pinned tasks, task_interrupt_and_wait_for).

Host-side I/O and orchestration run here (trajectory prefetch, script
evals); device work stays inside the jitted pipelines. "Pinned main-thread
tasks" become `run_main_queue()` callbacks — the host-callback pattern of
SURVEY.md §5.8.
"""

from __future__ import annotations

import queue
import threading
import uuid
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class TaskHandle:
    id: str
    label: str
    future: Optional[Future] = None
    _progress: float = 0.0
    _interrupt: threading.Event = field(default_factory=threading.Event)
    dependency: Optional["TaskHandle"] = None

    @property
    def progress(self) -> float:
        return self._progress

    def set_progress(self, frac: float):
        self._progress = max(0.0, min(1.0, frac))

    def interrupt(self):
        self._interrupt.set()

    @property
    def interrupted(self) -> bool:
        return self._interrupt.is_set()

    def done(self) -> bool:
        return self.future is not None and self.future.done()

    def wait(self, timeout: Optional[float] = None):
        if self.future is not None:
            return self.future.result(timeout)

    def interrupt_and_wait(self, timeout: Optional[float] = None):
        """task_interrupt_and_wait_for (task_system.h:60)."""
        self.interrupt()
        try:
            self.wait(timeout)
        except Exception:
            pass


class TaskSystem:
    """Thread-pool tasks + a main-thread pinned queue."""

    def __init__(self, num_workers: int = 4):
        self._pool = ThreadPoolExecutor(
            max_workers=max(2, num_workers), thread_name_prefix="vtpu-task"
        )
        self._tasks: dict[str, TaskHandle] = {}
        self._main_queue: "queue.Queue[Callable[[], None]]" = queue.Queue()
        self._lock = threading.Lock()

    # -- pool tasks ----------------------------------------------------------
    def enqueue(
        self,
        label: str,
        fn: Callable[[TaskHandle], Any],
        dependency: Optional[TaskHandle] = None,
    ) -> TaskHandle:
        """Run fn(task) on the pool. `fn` should poll task.interrupted and
        call task.set_progress."""
        handle = TaskHandle(id=uuid.uuid4().hex[:8], label=label,
                            dependency=dependency)

        def run():
            if dependency is not None:
                dependency.wait()
            if handle.interrupted:
                return None
            out = fn(handle)
            handle.set_progress(1.0)
            return out

        handle.future = self._pool.submit(run)
        with self._lock:
            self._tasks[handle.id] = handle
        return handle

    def enqueue_range(
        self,
        label: str,
        fn: Callable[[int, int, TaskHandle], Any],
        total: int,
        grain: int = 1024,
        dependency: Optional[TaskHandle] = None,
    ) -> TaskHandle:
        """Range task partitioned by grain (the pool-task range pattern,
        task_system.cpp:75). Chunks run sequentially inside one worker with
        progress per chunk; use several enqueue_range calls for parallelism."""

        def run(handle: TaskHandle):
            results = []
            for beg in range(0, total, grain):
                if handle.interrupted:
                    break
                end = min(beg + grain, total)
                results.append(fn(beg, end, handle))
                handle.set_progress(end / max(total, 1))
            return results

        return self.enqueue(label, run, dependency)

    def running_tasks(self) -> list[TaskHandle]:
        """Visible async tasks (the draw_async_task_window overlay feed,
        main.cpp:3889)."""
        with self._lock:
            self._tasks = {
                k: t for k, t in self._tasks.items() if not t.done()
            }
            return list(self._tasks.values())

    # -- main-thread pinned tasks -------------------------------------------
    def enqueue_main(self, fn: Callable[[], None]):
        self._main_queue.put(fn)

    def run_main_queue(self, max_items: int = 64) -> int:
        """Drain pinned tasks on the calling (main) thread."""
        n = 0
        while n < max_items:
            try:
                fn = self._main_queue.get_nowait()
            except queue.Empty:
                break
            fn()
            n += 1
        return n

    def shutdown(self, wait: bool = True):
        for t in self.running_tasks():
            t.interrupt()
        self._pool.shutdown(wait=wait)
