"""Cross-framework TRAINING-TRAJECTORY parity (round-4 verdict, Missing #2).

All other parity is op/forward-level (goldens, oracles).  This test proves
the full training LOOP matches the reference dynamics: same converted init,
same synthetic batches, same optimizer (torch ``Adam(amsgrad=True)``,
reference ``second_stage_video.py:662-663``) with the same weight decay, and
the same LR warmup/decay ramp (``linear_var`` warmup then linear decay,
reference ``second_stage_video.py:249-264``), stepped N times in BOTH
frameworks — the NLL trajectories must track step for step.

This is the strongest egress-free substitute for the "per-model FVD within
2% of the PyTorch checkpoints" north star (no datasets / released
checkpoints are mounted in this environment): if per-op forwards agree
(test_reference_parity.py) AND N optimizer steps stay on the reference's
loss trajectory, the training math is the reference's.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted",
)

NUM_STEPS = [2, 1]
C, HC, B, S = 8, 6, 4, 8
HIDDEN = 32
N_TRAIN = 30          # >= 20 per the round-4 verdict
WARMUP = 10           # lr_scaling_max_it
LR = 1e-3
WD = 1e-5


def _batches(n):
    rng = np.random.default_rng(42)
    out = []
    for _ in range(n):
        out.append((
            rng.normal(size=(B, C, S, S)).astype(np.float32),
            rng.normal(size=(B, HC, S, S)).astype(np.float32),
        ))
    return out


@pytest.fixture(scope="module")
def torch_trajectory():
    """Reference training math, verbatim: MultiScaleInternal cINN + FlowLoss
    + Adam(amsgrad=True, wd) + the linear_var warmup->decay ramp applied at
    batch START from global_step (on_train_batch_start,
    second_stage_video.py:249-264)."""
    if REF not in sys.path:
        sys.path.append(REF)  # APPEND: REF at [0] would shadow repo main.py
    import torch

    from models.modules.INN.loss import FlowLoss
    from models.modules.INN.macow2 import MaCowStep, MultiScaleInternal

    def linear_var(act_it, start_it, end_it, start_val, end_val, clip_min,
                   clip_max):
        # reference utils/general.py:221-229 (unimportable here: its module
        # pulls in coloredlogs, not installed in this image)
        act_val = (float(end_val - start_val) / (end_it - start_it)
                   * (act_it - start_it) + start_val)
        return np.clip(act_val, a_min=clip_min, a_max=clip_max)

    torch.manual_seed(0)
    net = MultiScaleInternal(
        MaCowStep, num_steps=NUM_STEPS, in_channels=C,
        hidden_channels=HIDDEN, h_channels=HC, factor=4,
        transform="affine", prior_transform="affine", kernel_size=(2, 3),
        coupling_type="conv", activation="elu", use_1x1=False,
        condition_nice=False,
    )
    init_x, init_h = _batches(1)[0]
    with torch.no_grad():  # trigger the data-dependent init buffers
        net(torch.from_numpy(init_x), h=torch.from_numpy(init_h))
    state0 = {k: v.detach().numpy().copy()
              for k, v in net.state_dict().items()}

    loss_fn = FlowLoss(spatial_mean=False, logdet_weight=1.0)
    opt = torch.optim.Adam(net.parameters(), lr=LR, betas=(0.9, 0.999),
                           weight_decay=WD, amsgrad=True)
    losses = []
    for it, (x, h) in enumerate(_batches(N_TRAIN)):
        # the reference adjusts lr at batch start from global_step
        if it < WARMUP:
            lr = linear_var(it, 0, WARMUP, 0.0, LR, 0.0, LR)
        else:
            lr = linear_var(it, WARMUP, N_TRAIN, LR, 0.0, 0.0, LR)
        for pg in opt.param_groups:
            pg["lr"] = float(lr)
        opt.zero_grad()
        out, logdet = net(torch.from_numpy(x), h=torch.from_numpy(h))
        loss, _ = loss_fn(out, logdet)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return {"state0": state0, "losses": np.asarray(losses)}


def test_nll_trajectory_tracks_reference(torch_trajectory):
    """Same ported init + same batches + flow_adam (torch-exact AMSGrad) +
    warmup_linear_decay == the reference's NLL trajectory, step for step."""
    import jax
    import jax.numpy as jnp

    from ipoke_tpu.core.optim import (
        flow_adam,
        warmup_linear_decay,
        zero_buffer_grads,
    )
    from ipoke_tpu.flows import MultiScaleInternal, flow_loss
    from tools.port_reference_flow import port_multiscale_state

    flow = MultiScaleInternal(
        num_steps=tuple(NUM_STEPS), in_channels=C, hidden_channels=HIDDEN,
        h_channels=HC, factor=4, transform="affine",
        prior_transform="affine", kernel_size=(2, 3), activation="elu",
    )
    params = port_multiscale_state(torch_trajectory["state0"], NUM_STEPS)

    sched = warmup_linear_decay(LR, WARMUP, N_TRAIN)
    tx = flow_adam(sched, weight_decay=WD, params=params)
    opt = tx.init(params)

    import optax

    @jax.jit
    def step(params, opt, x, h):
        def loss_of(p):
            z, logdet = flow.forward(p, x, h)
            loss, _ = flow_loss(z, logdet)
            return loss

        loss, grads = jax.value_and_grad(loss_of, allow_int=True)(params)
        grads = zero_buffer_grads(grads, params)
        upd, opt2 = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt2, loss

    losses = []
    for x, h in _batches(N_TRAIN):
        xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NCHW -> NHWC
        hj = jnp.asarray(np.transpose(h, (0, 2, 3, 1)))
        params, opt, loss = step(params, opt, xj, hj)
        losses.append(float(loss))
    losses = np.asarray(losses)
    ref = torch_trajectory["losses"]

    # the trajectory must MOVE (parameters are actually updating: the loss
    # landscape shifts with each fresh random batch, so no monotonicity —
    # the contract is TRACKING the reference, not descending on noise)
    assert np.abs(np.diff(ref)).max() > 1e-3
    rel = np.abs(losses - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 5e-3, (
        f"NLL trajectories diverge: max rel {rel.max():.2e} at step "
        f"{rel.argmax()}\n jax  {losses}\n ref  {ref}")


def test_torch_amsgrad_update_matches_reference_optimizer():
    """scale_by_torch_amsgrad reproduces torch.optim.Adam(amsgrad=True)'s
    per-step update bit-for-bit (to fp32 tolerance) on a synthetic problem —
    isolating the optimizer from the model."""
    import jax.numpy as jnp
    import optax
    import torch

    from ipoke_tpu.core.optim import scale_by_torch_amsgrad

    rng = np.random.default_rng(7)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) * (1 + 3 * (i % 4))
             for i in range(12)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=3e-3, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=0.0, amsgrad=True)
    t_traj = []
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        t_traj.append(tp.detach().numpy().copy())

    tx = optax.chain(scale_by_torch_amsgrad(),
                     optax.scale_by_learning_rate(3e-3))
    jp = jnp.asarray(p0)
    state = tx.init(jp)
    for g, want in zip(grads, t_traj):
        upd, state = tx.update(jnp.asarray(g), state, jp)
        jp = optax.apply_updates(jp, upd)
        np.testing.assert_allclose(np.asarray(jp), want, rtol=1e-6,
                                   atol=1e-7)
