"""CLI layer: crf-train / crf-decode (the reference's CRFTrain /
CRFFstDecode top-level programs — SURVEY.md §2.1 L7)."""
