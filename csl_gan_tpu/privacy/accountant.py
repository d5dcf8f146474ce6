"""Stateful RDP accountant with checkpointable state.

The reference's accountant state lives implicitly in `privacy_engine.steps`
and is *lost on resume* (SURVEY.md §5.3; reference budget_analysis.py exists
partly to recompute epsilon offline). Here the accountant is an explicit,
JSON-serializable object that the checkpoint layer persists and restores, so
epsilon after resume is correct.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from csl_gan_tpu.privacy import rdp as rdp_mod


@dataclass
class RdpAccountant:
    """Tracks RDP over homogeneous sampled-Gaussian steps.

    Mirrors the accounting inputs of the reference engines
    (train.py:96-101): sample_rate = batch_size / sample_size,
    noise_multiplier = sigma, orders = alphas.
    """

    batch_size: int
    sample_size: int
    noise_multiplier: float
    alphas: List[float] = field(default_factory=lambda: list(rdp_mod.DEFAULT_ALPHAS))
    steps: float = 0.0

    @property
    def sample_rate(self) -> float:
        return self.batch_size / self.sample_size

    def step(self, n: int = 1) -> None:
        self.steps += n

    def get_privacy_spent(self, delta: float) -> Tuple[float, float]:
        """(epsilon, best_alpha) after `self.steps` compositions."""
        if self.steps == 0:
            return 0.0, float(self.alphas[0])
        rdp = rdp_mod.compute_rdp(self.sample_rate, self.noise_multiplier,
                                  self.steps, self.alphas)
        return rdp_mod.get_privacy_spent(self.alphas, rdp, delta)

    # --- checkpoint plumbing (fixes reference resume epsilon undercount) ---
    def state_dict(self) -> dict:
        return {
            "batch_size": self.batch_size,
            "sample_size": self.sample_size,
            "noise_multiplier": self.noise_multiplier,
            "alphas": list(self.alphas),
            "steps": self.steps,
        }

    @classmethod
    def from_state_dict(cls, state: dict) -> "RdpAccountant":
        return cls(**state)
