"""Flight-control semantics of retrieval.pipeline_util.run_pipelined."""

from osr_tpu.retrieval.pipeline_util import run_pipelined


def test_all_items_dispatched_and_collected_in_order():
    events = []
    collected = []
    run_pipelined(
        list(range(10)),
        3,
        lambda chunk: events.append(("d", tuple(chunk))) or tuple(chunk),
        lambda chunk, h: collected.append((tuple(chunk), h)),
        depth=1,
    )
    assert [h for _, h in collected] == [
        (0, 1, 2), (3, 4, 5), (6, 7, 8), (9,),
    ]
    # chunk passed to collect equals the dispatched chunk
    assert all(c == h for c, h in collected)


def test_depth_bounds_in_flight():
    """At most depth+1 chunks may be un-collected at any dispatch."""
    outstanding = []
    max_seen = 0

    def dispatch(chunk):
        outstanding.append(chunk)
        nonlocal max_seen
        max_seen = max(max_seen, len(outstanding))
        return None

    run_pipelined(
        list(range(20)),
        2,
        dispatch,
        lambda chunk, h: outstanding.remove(chunk),
        depth=2,
    )
    assert not outstanding
    assert max_seen == 3  # depth+1: collect fires after the next dispatch


def test_empty_pending_is_noop():
    run_pipelined([], 4, lambda c: 1 / 0, lambda c, h: 1 / 0)
