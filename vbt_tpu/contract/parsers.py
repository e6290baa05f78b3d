"""Parsers for external ground-truth and dataset formats.

Covers the three input formats the reference consumes:

- Kinovea trajectory exports (kinovea.py:77-91): ``#``-comment header,
  space-delimited ``T X Y`` rows with comma decimal separators, centimetres.
- Qualisys motion-capture exports (qualysis.py:76-105): 11 header rows,
  tab-delimited, ``Osa L X`` / ``Osa L Z`` marker columns, millimetres,
  x axis negated.
- PASCAL-VOC detection annotations (eval.py:42-54, eval.py:488-504):
  ``<object><name>barbell</name><bndbox>`` boxes as ``[ymin,xmin,ymax,xmax]``.
"""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd

DEFAULT_LABEL = "barbell"  # eval.py:23


def read_kinovea_export(path: str) -> pd.DataFrame:
    """Read a Kinovea trajectory export into a (time, x, y) dataframe in meters.

    Matches kinovea.py:77-91: comma decimal separators and cm -> m conversion.
    """
    df = pd.read_csv(
        path,
        comment="#",
        header=None,
        names=["time", "x", "y"],
        delimiter=" ",
        dtype={"time": float},
        converters={
            "x": lambda v: float(v.replace(",", ".")),
            "y": lambda v: float(v.replace(",", ".")),
        },
        index_col=False,
    )
    df["x"] = df["x"] / 100.0
    df["y"] = df["y"] / 100.0
    return df


def read_qualisys_export(path: str) -> pd.DataFrame:
    """Read a Qualisys mocap tsv into a (time, x, y) dataframe in meters.

    Matches qualysis.py:76-105: skip the 11-row header, keep the ``Osa L``
    marker's X (negated) and Z axes, mm -> m conversion.
    """
    df = pd.read_csv(
        path,
        delimiter="\t",
        skiprows=11,
        usecols=["Time", "Osa L X", "Osa L Z"],
        index_col=False,
    )
    df = df.rename(columns={"Time": "time", "Osa L X": "x", "Osa L Z": "y"})
    df["x"] = -df["x"] / 1000.0
    df["y"] = df["y"] / 1000.0
    return df


def read_voc_file(path: str, label: str = DEFAULT_LABEL) -> tuple[str, np.ndarray]:
    """Parse one PASCAL-VOC XML file.

    Returns ``(image_filename, boxes)`` where boxes is an (N, 4) int array of
    ``[ymin, xmin, ymax, xmax]`` rows for objects matching ``label``
    (eval.py:42-54, eval.py:494-504).
    """
    root = ET.parse(path).getroot()
    filename = root.find("filename").text
    boxes = []
    for obj in root.findall("object"):
        if obj.find("name").text != label:
            continue
        bb = obj.find("bndbox")
        boxes.append(
            [
                int(bb.find("ymin").text),
                int(bb.find("xmin").text),
                int(bb.find("ymax").text),
                int(bb.find("xmax").text),
            ]
        )
    return filename, np.array(boxes, dtype=int).reshape(-1, 4)


def read_voc_annotations(
    annotations_dir: str, label: str = DEFAULT_LABEL
) -> dict[str, np.ndarray]:
    """Parse every ``*.xml`` under a directory into {image_filename: boxes}.

    Matches the ground-truth loading loop at eval.py:488-504.
    """
    annotations: dict[str, np.ndarray] = {}
    for f in glob.glob(os.path.join(annotations_dir, "*.xml")):
        filename, boxes = read_voc_file(f, label=label)
        annotations[filename] = boxes
    return annotations
