"""Public data contract shared with the reference implementation.

Everything downstream (analysis, CLIs, golden-file tests) speaks through the
schemas and parsers defined here.
"""

from vbt_tpu.contract.schema import (
    TRACK_COLUMNS,
    TrackFileName,
    build_track_df,
    build_df_filename,
    max_travel_id,
    parse_df_filename,
    validate_track_df,
)
from vbt_tpu.contract.parsers import (
    read_kinovea_export,
    read_qualisys_export,
    read_voc_annotations,
    read_voc_file,
)
from vbt_tpu.contract.golden import compare_track_dfs

__all__ = [
    "TRACK_COLUMNS",
    "TrackFileName",
    "build_track_df",
    "build_df_filename",
    "max_travel_id",
    "parse_df_filename",
    "validate_track_df",
    "read_kinovea_export",
    "read_qualisys_export",
    "read_voc_annotations",
    "read_voc_file",
    "compare_track_dfs",
]
