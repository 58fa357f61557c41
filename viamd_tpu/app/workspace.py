"""Workspace (.via) persistence.

Rebuild of the reference's workspace serialization
(save_workspace viamd.cpp:1042-1199 / load_workspace viamd.cpp:726-1040,
format helpers serialization_utils.h:23-52): a text format of `[Section]`
headers and `Ident=arg` lines, with base64 bitfields for stored selections,
relative file paths, camera/animation state, representations, and the
script text. Components participate through the Serialize/Deserialize event
pair (shapespace.cpp:100-126 pattern).
"""

from __future__ import annotations

import base64
import os

import numpy as np

from viamd_tpu.app.events import EventType
from viamd_tpu.app.session import Representation
from viamd_tpu.core.bitfield import Bitfield


def _rel(path, base):
    if not path:
        return ""
    try:
        return os.path.relpath(path, base)
    except ValueError:
        return path


class WorkspaceWriter:
    """Section/ident writer (serialization_utils write_* analog)."""

    def __init__(self):
        self.lines: list[str] = []

    def section(self, name: str):
        if self.lines:
            self.lines.append("")
        self.lines.append(f"[{name}]")

    def entry(self, ident: str, *args):
        vals = ",".join(str(a) for a in args)
        self.lines.append(f"{ident}={vals}")

    def text(self) -> str:
        return "\n".join(self.lines) + "\n"


def parse_workspace(text: str) -> list[tuple[str, dict]]:
    """→ ordered [(section, {ident: [raw values]})] (next_entry analog);
    repeated sections repeat in the list, repeated idents keep last."""
    sections: list[tuple[str, dict]] = []
    cur = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("[") and line.endswith("]"):
            cur = (line[1:-1], {})
            sections.append(cur)
        elif "=" in line and cur is not None:
            ident, val = line.split("=", 1)
            cur[1][ident.strip()] = val
    return sections


def save_workspace(session, path: str):
    base = os.path.dirname(os.path.abspath(path))
    w = WorkspaceWriter()
    w.section("Files")
    w.entry("MoleculeFile", _rel(session.files.get("system"), base))
    w.entry("TrajectoryFile", _rel(session.files.get("trajectory"), base))

    w.section("Animation")
    w.entry("Frame", f"{session.frame:.6f}")

    if session.camera is not None:
        c = session.camera
        w.section("Camera")
        w.entry("Position", *np.asarray(c.eye, np.float64))
        w.entry("Focus", *np.asarray(c.center, np.float64))
        w.entry("Up", *np.asarray(c.up, np.float64))
        w.entry("Fov", c.fovy)

    for rep in session.representations:
        w.section("Representation")
        w.entry("Name", rep.name)
        w.entry("Filter", rep.filter)
        w.entry("Type", rep.type)
        w.entry("ColorMapping", rep.color_mapping)
        w.entry("Enabled", int(rep.enabled))
        w.entry("RadiusScale", rep.radius_scale)
        w.entry("Alpha", rep.alpha)
        w.entry("UniformColor", *rep.uniform_color)

    for name, bf in session.stored_selections.items():
        w.section("Selection")
        w.entry("Name", name)
        w.entry("Mask", bf.to_base64())

    w.section("Script")
    w.entry(
        "Text",
        base64.b64encode(session.script_text.encode("utf-8")).decode("ascii"),
    )

    session.events.broadcast(EventType.SERIALIZE, w)

    with open(path, "w") as f:
        f.write(w.text())


def load_workspace(session, path: str):
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        sections = parse_workspace(f.read())

    session.stored_selections = {}
    pending_traj = None
    reps_loaded: list[Representation] = []
    for name, entries in sections:
        if name == "Files":
            mol = entries.get("MoleculeFile", "")
            trj = entries.get("TrajectoryFile", "")
            if mol:
                session.load(os.path.join(base, mol))
            if trj and trj != mol:
                pending_traj = os.path.join(base, trj)
        elif name == "Animation":
            session.frame = float(entries.get("Frame", "0") or 0)
        elif name == "Camera":
            from viamd_tpu.render.camera import Camera

            def vec(key, default):
                v = entries.get(key)
                return (
                    np.asarray([float(t) for t in v.split(",")], np.float32)
                    if v
                    else default
                )

            session.camera = Camera(
                eye=vec("Position", np.array([0, 0, 10], np.float32)),
                center=vec("Focus", np.zeros(3, np.float32)),
                up=vec("Up", np.array([0, 1, 0], np.float32)),
                fovy=float(entries.get("Fov", "0.785") or 0.785),
            )
        elif name == "Representation":
            reps_loaded.append(
                Representation(
                    name=entries.get("Name", "rep"),
                    filter=entries.get("Filter", "all"),
                    type=entries.get("Type", "spacefill"),
                    color_mapping=entries.get("ColorMapping", "cpk"),
                    enabled=bool(int(entries.get("Enabled", "1") or 1)),
                    radius_scale=float(entries.get("RadiusScale", "1") or 1),
                    alpha=float(entries.get("Alpha", "1") or 1),
                    uniform_color=tuple(
                        float(v)
                        for v in entries.get(
                            "UniformColor", "0.6,0.6,0.9,1"
                        ).replace(",", " ").split()
                    ),
                )
            )
        elif name == "Selection":
            nm = entries.get("Name", "sel")
            mask = entries.get("Mask", "")
            if mask:
                session.stored_selections[nm] = Bitfield.from_base64(mask)
        elif name == "Script":
            t = entries.get("Text", "")
            if t:
                session.script_text = base64.b64decode(t).decode("utf-8")

    if pending_traj:
        session.load(pending_traj)
    if reps_loaded:
        # workspace reps replace the default created by load()
        session.representations = reps_loaded
    session._update_representations()
    if session.script_text and session.system is not None:
        session.compile_script()
    session.events.broadcast(EventType.DESERIALIZE, sections)
