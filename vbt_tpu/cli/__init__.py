"""Preserved public CLI surface (track / plot / eval / kinovea / qualisys / train).

Flag names, defaults, and output artifacts match the reference CLIs
(track.py:65-72, plot.py:50-54, eval.py:471-480, kinovea.py:29-34,
qualysis.py:29-34); the machinery underneath is the TPU-native stack.
"""
