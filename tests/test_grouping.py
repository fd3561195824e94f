"""train/grouping.fused_groups — the fused-dispatch batch grouping rules."""

from tacotronv2_wavernn_chinese_tpu.train.grouping import fused_groups


class Counter:
    """Stands in for the driver's live step counter."""

    def __init__(self):
        self.step = 0


def _drain(batches, spd, total, key_fn=None):
    c = Counter()
    groups = []
    for g in fused_groups(iter(batches), spd, lambda: c.step, total, key_fn):
        groups.append(g)
        c.step += len(g)
    return groups, c.step


def test_spd_one_passes_through():
    groups, step = _drain(list("abcdef"), 1, 100)
    assert groups == [[b] for b in "abcdef"]
    assert step == 6


def test_groups_of_spd_and_tail_singles():
    groups, step = _drain(list("abcdefg"), 3, 100)
    assert groups == [list("abc"), list("def"), ["g"]]
    assert step == 7


def test_stops_at_total_steps():
    groups, step = _drain(list("abcdefgh"), 2, 5)
    # two full groups (4 steps), then a would-overshoot group falls back to
    # a single step, then the cutoff
    assert step == 5
    assert [len(g) for g in groups] == [2, 2, 1]


def test_near_total_steps_forces_singles():
    groups, step = _drain(list("abcd"), 4, 3)
    assert [len(g) for g in groups] == [1, 1, 1]
    assert step == 3


def test_key_fn_groups_same_shape_only():
    batches = ["a1", "b1", "a2", "b2", "a3", "b3"]
    groups, step = _drain(batches, 2, 100, key_fn=lambda b: b[0])
    # a's and b's group separately, in arrival order of completion; the
    # odd-one-out of each key flushes singly at the tail
    assert ["".join(g) for g in groups] == ["a1a2", "b1b2", "a3", "b3"]
    assert step == 6
    flat = [b for g in groups for b in g]
    assert sorted(flat) == sorted(batches)


def test_partial_groups_flush_as_singles():
    groups, step = _drain(["x1", "y1", "x2"], 3, 100, key_fn=lambda b: b[0])
    # nothing reaches spd=3; everything flushes singly at the tail
    assert [len(g) for g in groups] == [1, 1, 1]
    assert step == 3
