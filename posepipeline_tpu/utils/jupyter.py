"""Notebook video players (reference utils/jupyter.py:4-30)."""

from __future__ import annotations


def play(video_table, width: int = 640):
    """Display a *Video table row's output video inline."""
    from IPython.display import HTML, Video, display

    video = video_table.fetch1("output_video")
    display(Video(video, width=width, html_attributes="controls autoplay loop"))


def play_grid(videos, height: int = 200):
    """Display a grid of *Video table rows side by side."""
    from IPython.display import HTML, Video, display

    if not isinstance(videos[0], list):
        videos = [videos]
    kwargs = {"height": height, "html_attributes": "controls autoplay loop"}
    html_rows = [
        [Video(v.fetch1("output_video"), **kwargs)._repr_html_() if v is not None else ""
         for v in row]
        for row in videos
    ]
    display(HTML("<table><tr>{}</tr></table>".format(
        "</tr><tr>".join("<td>{}</td>".format("</td><td>".join(str(c) for c in row))
                         for row in html_rows))))
