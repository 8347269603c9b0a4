"""Full trainer lifecycle under the 8-virtual-device mesh (VERDICT r2 #3).

Drives the exact sequence real multi-host jobs deadlock or silently
diverge on: Grain loading + dp mesh XE epochs -> forced patience -> RL
switch -> dp-sharded SCST -> async Orbax save -> two simulated
preemptions -> resume, asserting the preempted history reproduces the
uninterrupted one bit-for-bit (epoch, val_loss, every parameter).

The implementation lives in __graft_entry__._lifecycle_multichip_impl so
the driver's dryrun_multichip exercises the identical code path.
"""

import jax


def test_lifecycle_resumed_equals_uninterrupted(tmp_path):
    from __graft_entry__ import _lifecycle_multichip_impl

    n = len(jax.devices())
    assert n == 8, f"conftest should provide 8 virtual devices, got {n}"
    # raises on any divergence; prints the stage log
    _lifecycle_multichip_impl(n, workdir=str(tmp_path))
