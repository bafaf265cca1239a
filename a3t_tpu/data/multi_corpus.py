"""Multi-corpus, mixed-sample-rate pretraining support.

The reference trains A3T on a mixture of corpora with different front-end
settings (libritts 0.6 / librispeech 0.2 / vctk 0.2 of the iterations per
epoch, with per-corpus fs/n_fft/hop overrides and speech-only corpora —
espnet2/tasks/mlm.py:499-591 overriding MultipleIterFactory).

Here each corpus keeps its own BucketBatcher (+ its own LogMelConfig); the
factory yields ``(corpus_name, batch)`` with corpora interleaved by portion
weights, and :func:`make_multi_corpus_train_step` dispatches each batch to
the jitted step built for that corpus' front-end (one compiled program per
(corpus, bucket) shape — all static).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

from a3t_tpu.data.batcher import BucketBatcher
from a3t_tpu.data.iterator import PrefetchIterator


@dataclasses.dataclass
class CorpusSpec:
    name: str
    batcher: BucketBatcher
    portion: float
    speech_only: bool = False


class MultiCorpusIterFactory:
    """factory(epoch) -> iterator of (corpus_name, host_batch)."""

    def __init__(
        self,
        corpora: list[CorpusSpec],
        num_iters_per_epoch: int,
        shard: tuple[int, int] = (0, 1),
        prefetch: int = 2,
        seed: int = 0,
        transform=None,
    ):
        total = sum(c.portion for c in corpora)
        self.corpora = corpora
        self.weights = [c.portion / total for c in corpora]
        self.num_iters = num_iters_per_epoch
        self.shard = shard
        self.prefetch = prefetch
        self.seed = seed
        self.transform = transform

    def __call__(self, epoch: int):
        def gen():
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, 4242]))
            # per-corpus batch counts for this epoch (portions of num_iters,
            # the reference's split, tasks/mlm.py:509)
            counts = [int(round(w * self.num_iters)) for w in self.weights]
            counts[0] += self.num_iters - sum(counts)
            iters = []
            schedule = []
            for ci, (spec, n) in enumerate(zip(self.corpora, counts)):
                schedule.extend([ci] * n)

                def make_iter(spec=spec):
                    offset = 0
                    while True:
                        it = spec.batcher.epoch_iterator(
                            epoch + offset, self.shard)
                        produced = False
                        for b in it:
                            produced = True
                            yield b
                        if not produced:
                            return
                        offset += 1000
                iters.append(make_iter())
            rng.shuffle(schedule)
            for ci in schedule:
                try:
                    batch = next(iters[ci])
                except StopIteration:
                    continue
                yield (self.corpora[ci].name, batch)

        if self.prefetch > 0:
            return PrefetchIterator(gen(), self.prefetch, self.transform)
        if self.transform is not None:
            return map(self.transform, gen())
        return gen()


def make_multi_corpus_train_step(
    model,
    frontends: dict[str, "object"],
    speech_only: dict[str, bool],
    mesh=None,
) -> Callable:
    """(state, (name, batch), rng) -> (state, stats): per-corpus jitted
    steps (each with its own front-end and speech_only flag) behind one
    dispatcher."""
    from a3t_tpu.train.train_step import make_train_step

    steps = {
        name: make_train_step(
            model, fe, mesh=mesh, speech_only=speech_only.get(name, False),
            donate=False,
        )
        for name, fe in frontends.items()
    }

    def step(state, named_batch, rng):
        name, batch = named_batch
        return steps[name](state, batch, rng)

    return step
