"""Human-in-the-loop annotation GUI (the PersonBboxValid gate).

Reference: utils/annotation.py:10-83 — an ipywidgets ToggleButtons track
picker over the TrackingBboxVideo overlay, committing into PersonBboxValid.
The widget layer is optional (notebooks); the commit path (``assign_video``)
lives in utils/tracking.py and works headless.
"""

from __future__ import annotations

import numpy as np

from .tracking import assign_video, mark_invalid_video


def annotation_targets(tracking_method: int | None = None):
    """Keys awaiting annotation: TrackingBbox rows without PersonBboxValid."""
    from ..pipeline import PersonBboxValid, TrackingBbox

    expr = TrackingBbox - PersonBboxValid
    if tracking_method is not None:
        expr = expr & {"tracking_method": tracking_method}
    return expr.fetch("KEY")


def annotate(key, subject_id: int = 0):
    """Interactive widget: pick the subject-of-interest track for ``key``.

    Falls back to a text prompt outside Jupyter.
    """
    from ..pipeline import TrackingBbox, TrackingBboxVideo

    tracks = (TrackingBbox & key).fetch1("tracks")
    track_ids = sorted({int(t["track_id"]) for frame in tracks for t in frame})

    try:
        import ipywidgets as widgets
        from IPython.display import display

        from .jupyter import play

        if TrackingBboxVideo & key:
            play(TrackingBboxVideo & key)
        options = [("invalid video", None)] + [(f"track {i}", i) for i in track_ids]
        picker = widgets.ToggleButtons(options=options, description="Subject:")
        button = widgets.Button(description="Commit")

        def on_commit(_):
            if picker.value is None:
                mark_invalid_video(key, key["tracking_method"])
            else:
                assign_video(key, subject_id, [picker.value])

        button.on_click(on_commit)
        display(picker, button)
    except ImportError:
        print(f"Tracks present: {track_ids}")
        choice = input("Subject track id (or 'invalid'): ").strip()
        if choice == "invalid":
            mark_invalid_video(key, key["tracking_method"])
        else:
            assign_video(key, subject_id, [int(choice)])
