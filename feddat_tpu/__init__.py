"""feddat_tpu — TPU-native federated multimodal PEFT framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
FedDAT (HaokunChen245/FedDAT, arXiv:2308.12305): parameter-efficient federated
fine-tuning of vision-language foundation models (ViLT-B/32, ALBEF) across
heterogeneous VQA clients, with the Dual-Adapter-Teacher module, Mutual
Knowledge Distillation, FedAvg of the shared adapter subset, per-client
personalization, and a full PEFT baseline zoo.

Design stance (vs. the PyTorch reference, see /root/repo/SURVEY.md):
  * parameters are pytrees partitioned by role (backbone / shared / local /
    teacher / head), not mutable ``requires_grad`` flags + name matching;
  * adapter selection is a static argument to a pure ``apply``, not object
    mutation;
  * clients are a mesh axis — FedAvg is a weighted ``psum`` over ICI, not a
    Python loop over ``deepcopy`` models;
  * the input pipeline runs on host with static shapes and device prefetch,
    never inside ``forward``.
"""

__version__ = "0.1.0"
