"""Training-data operations over large corpora: dedup, similarity
search, text analysis, relational/windowed aggregates, multimodal
plumbing. Each op is a Dataset-in/Dataset-out function designed for the
streaming executor; see the module docstrings for the partitioning and
shuffle strategy of each.
"""
