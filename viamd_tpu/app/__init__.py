"""Application layer: headless engine, events, tasks, workspace, exports.

Rebuild of the reference's L3-L5 application stack (SURVEY.md §1):
ApplicationState → Session; the event bus, async task system, .via
workspace persistence, exports, and the self-registering component model —
without a GUI (the north-star headless engine + CLI, SURVEY.md §5.6).
"""

from viamd_tpu.app.session import Session

__all__ = ["Session"]
