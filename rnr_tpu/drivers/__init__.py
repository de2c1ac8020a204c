"""CLI drivers: precompute, stitch_lp, train/test for RNR and DNR."""
