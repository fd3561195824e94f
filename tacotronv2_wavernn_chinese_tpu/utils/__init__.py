


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m`` (shape-bucketing helper shared
    by the data loader and the synthesizer)."""
    return x if x % m == 0 else x + m - x % m
