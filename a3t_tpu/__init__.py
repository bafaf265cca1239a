"""a3t_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for alignment-aware
acoustic & text pretraining (A3T), speech editing and prompt-based TTS.

This is a from-scratch rebuild of the capability set of richardbaihe/a3t
(an ESPnet fork implementing "A3T: Alignment-Aware Acoustic and Text
Pretraining", ICML 2022), designed TPU-first:

* the mel front-end runs on-device inside the jitted train step
  (the reference runs torch.stft on CPU inside the collate fn,
  espnet2/train/collate_fn.py:220),
* all shapes are static (bucketed batching instead of numel packing),
* distribution is expressed as shardings over a `jax.sharding.Mesh`
  (data / model axes) instead of NCCL DDP,
* hot ops (fused log-mel, banded attention) have Pallas TPU kernels.

Subpackages
-----------
dsp        STFT / mel filterbank / log-mel front-end (torch.stft-parity)
ops        Pallas TPU kernels for the hot paths
masking    T5-style span masking over phone alignments (A3T core)
models     Conformer MLM encoder/decoder, postnet, duration, vocoder
parallel   Mesh construction + sharding rules (dp/tp/fsdp/sp)
train      Optimizer, train step, trainer loop, reporter, checkpointing
data       Kaldi-style scp datasets, bucketing batcher, iterators
text       Tokenizers / token-id conversion
tasks      Config-driven task assembly (MLMTask analogue)
inference  Speech editing / prompt TTS API
eval       MCD evaluation harness
"""

__version__ = "0.1.0"
