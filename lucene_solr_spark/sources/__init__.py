"""Segment-table catalog, build manifest (lineage/resume), multimodal plumbing."""
