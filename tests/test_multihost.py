"""Simulated multi-host (DCN) sharding dry run.

``dryrun_multichip`` covers single-process sharding (the ICI analog);
this covers the one remaining SURVEY §5.8 claim — cross-HOST (DCN)
layout — by joining two local CPU processes into one
``jax.distributed`` cluster (2 x 4 virtual devices) and running the
sharded winding cross-check over the process-spanning mesh.  Process
boundaries stand in for host boundaries: global-array construction,
collective layout, and a cross-process all-gather are all real.
"""

def test_dryrun_multihost_two_processes():
    import __graft_entry__ as g

    g.dryrun_multihost(2)
