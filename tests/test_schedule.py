"""reference_eval_schedule must match the reference's control flow
(trainer.py:179-226) epoch-for-epoch."""

from transception_tpu.train.trainer import reference_eval_schedule


def simulate_reference(max_epoch: int, eval_interval: int):
    """Direct transliteration of the reference's per-epoch branch structure
    (trainer.py:179-226): returns [(save, eval)] per 0-based epoch."""
    out = []
    for epoch_num in range(max_epoch):
        saves = 0
        evals = 0
        if (epoch_num >= int(max_epoch / 2)
                and epoch_num < int(max_epoch - 100)
                and (epoch_num + 1) % 20 == 0):
            saves += 1
            evals += 1
        if (epoch_num >= int(max_epoch - 100)
                and (epoch_num + 1) % eval_interval == 0):
            saves += 1
            evals += 1
        if epoch_num >= max_epoch - 1:
            saves += 1
            if not (epoch_num + 1) % eval_interval == 0:
                evals += 1
        out.append((saves > 0, evals > 0))
    return out


def test_matches_reference_500_epochs():
    ref = simulate_reference(500, 20)
    got = [reference_eval_schedule(e, 500, 20) for e in range(500)]
    assert got == ref


def test_matches_reference_odd_intervals():
    for max_epoch, interval in [(400, 7), (150, 20), (120, 5), (50, 10),
                                (3, 1), (1, 20)]:
        ref = simulate_reference(max_epoch, interval)
        got = [reference_eval_schedule(e, max_epoch, interval)
               for e in range(max_epoch)]
        assert got == ref, (max_epoch, interval)


def test_phase_boundaries():
    # 500 epochs, interval 20: phase 1 covers [250, 400), phase 2 [400, 500).
    assert reference_eval_schedule(259, 500, 20) == (True, True)   # (259+1)%20==0
    assert reference_eval_schedule(249, 500, 20) == (False, False)  # below max/2
    assert reference_eval_schedule(419, 500, 20) == (True, True)   # phase 2
    assert reference_eval_schedule(499, 500, 20) == (True, True)   # last epoch
    # Last epoch evaluates even when the interval rule doesn't fire.
    assert reference_eval_schedule(122, 123, 20) == (True, True)
