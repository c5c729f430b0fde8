"""Measures the reference PyTorch implementation's CPU throughput.

The reference publishes no benchmarks (BASELINE.md), so the comparison
numbers are measured locally by *running* (not copying) the reference
package mounted at /root/reference. Results land in
benchmarks/BASELINE_MEASURED.json, which bench.py reads for its
`vs_baseline` field.

Usage: python benchmarks/measure_torch_baseline.py
"""

import json
import pathlib
import sys
import time

REFERENCE = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent / "BASELINE_MEASURED.json"


def main():
    sys.path.insert(0, REFERENCE)
    import numpy as np
    import torch
    import torch.nn as nn

    import aesmc.inference as ref_inference
    import aesmc.losses as ref_losses
    import aesmc.state as ref_state

    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(1)  # single-core box; make it explicit

    # LGSSM components against the reference library API (the reference's
    # own test models import pykalman at module scope, which is not
    # installed here, so equivalent callables are defined inline).
    class Initial:
        def __init__(self, loc, scale):
            self.loc, self.scale = loc, scale

        def __call__(self):
            return torch.distributions.Normal(self.loc, self.scale)

    class Transition(nn.Module):
        def __init__(self, mult, scale):
            super().__init__()
            self.mult = nn.Parameter(torch.tensor(float(mult)))
            self.scale = scale

        def forward(self, previous_latents=None, time=None,
                    previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    self.mult * previous_latents[-1], self.scale),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Emission(nn.Module):
        def __init__(self, mult, scale):
            super().__init__()
            self.mult = nn.Parameter(torch.tensor(float(mult)))
            self.scale = scale

        def forward(self, latents=None, time=None,
                    previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    self.mult * latents[-1], self.scale),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Proposal(nn.Module):
        def __init__(self, scale_0, scale_t):
            super().__init__()
            self.scale_0, self.scale_t = scale_0, scale_t
            self.lin_0 = nn.Linear(1, 1)
            self.lin_t = nn.Linear(2, 1)

        def forward(self, previous_latents=None, time=None,
                    observations=None):
            if time == 0:
                return ref_state.set_batch_shape_mode(
                    torch.distributions.Normal(
                        self.lin_0(observations[0].unsqueeze(-1))
                        .squeeze(-1), self.scale_0),
                    ref_state.BatchShapeMode.BATCH_EXPANDED)
            num_particles = previous_latents[-1].shape[1]
            obs = observations[time].view(-1, 1, 1).expand(
                -1, num_particles, 1)
            inp = torch.cat([previous_latents[-1].unsqueeze(-1), obs],
                            dim=2).view(-1, 2)
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    self.lin_t(inp).squeeze(-1).view(-1, num_particles),
                    self.scale_t),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class ref_lgssm:
        pass

    ref_lgssm.Initial = Initial
    ref_lgssm.Transition = Transition
    ref_lgssm.Emission = Emission
    ref_lgssm.Proposal = Proposal
    results = {"host": "cpu (torch, reference)", "configs": {}}

    def time_fn(fn, repeats, warmup=1):
        for _ in range(warmup):
            fn()
        t0 = time.perf_counter()
        for _ in range(repeats):
            fn()
        return (time.perf_counter() - t0) / repeats

    # ---- Config A (north star): SMC inference, LGSSM, T=200, B=10,
    # K=10000, log-ML only.
    T, B, K = 200, 10, 10000
    initial = ref_lgssm.Initial(0.0, 1.0)
    transition = ref_lgssm.Transition(0.9, 1.0)
    emission = ref_lgssm.Emission(1.0, 0.2)
    proposal = ref_lgssm.Proposal(1.0, 1.0)
    observations = [torch.randn(B) for _ in range(T)]

    def run_smc():
        with torch.no_grad():
            ref_inference.infer(
                "smc", observations, initial, transition, emission,
                proposal, K, return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=False)

    dt = time_fn(run_smc, repeats=2)
    results["configs"]["smc_infer_T200_B10_K10000"] = {
        "seconds_per_call": dt,
        "particle_steps_per_sec": B * K * T / dt,
    }
    print(f"reference SMC T={T} B={B} K={K}: {dt:.2f} s/call = "
          f"{B*K*T/dt/1e6:.3f} M particle-steps/s")

    # ---- Config B: AESMC train step (loss + backward + Adam),
    # reference training config T=200, B=10, K=100
    # (/root/reference/test/test_losses.py:93-100).
    T, B, K = 200, 10, 100
    transition_b = ref_lgssm.Transition(0.9, 1.0)
    emission_b = ref_lgssm.Emission(1.0, 0.2)
    proposal_b = ref_lgssm.Proposal(1.0, 1.0)
    observations_b = [torch.randn(B) for _ in range(T)]
    params = list(transition_b.parameters()) + \
        list(emission_b.parameters()) + list(proposal_b.parameters())
    optimizer = torch.optim.Adam(params)

    def train_step():
        optimizer.zero_grad()
        loss = ref_losses.get_loss(observations_b, K, "aesmc", initial,
                                   transition_b, emission_b, proposal_b)
        loss.backward()
        optimizer.step()

    dt = time_fn(train_step, repeats=3)
    results["configs"]["aesmc_train_step_T200_B10_K100"] = {
        "seconds_per_call": dt,
        "steps_per_sec": 1.0 / dt,
    }
    print(f"reference AESMC train step T={T} B={B} K={K}: {dt:.3f} s = "
          f"{1/dt:.3f} steps/s")

    OUT.write_text(json.dumps(results, indent=2))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
