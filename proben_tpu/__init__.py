"""proben_tpu — a TPU-native multimodal (RGB+thermal) object-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
Jamie725/Multimodal-Object-Detection-via-Probabilistic-Ensembling (a detectron2
fork implementing ECCV'22 "Multimodal Object Detection via Probabilistic
Ensembling", arXiv:2104.02904).

Capabilities:
  * Faster R-CNN (ResNet-50/101 + FPN) detection, TPU-first: static shapes,
    masked fixed-size detection pytrees, MXU-friendly NHWC convs, jit-able NMS
    and RoIAlign, pjit/shard_map data parallelism over a device mesh.
  * Four fusion strategies: single-modality (thermal/RGB), early fusion
    (4-channel BGRT stem), middle fusion (dual backbones, channel-concat FPN
    features), and ProbEn late fusion (Bayesian log-odds score fusion +
    variance/score-weighted box fusion).
  * Box-uncertainty head (Gaussian NLL loss, per-RoI variance).
  * FLIR ADAS (COCO mAP) and KAIST (log-average miss rate) evaluation.
"""

__version__ = "0.1.0"
