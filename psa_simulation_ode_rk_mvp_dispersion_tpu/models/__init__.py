"""Model families: the dual-pump 4-wave FWM/PSA model (fwm4) and the
N-wave cascaded FWM comb (nwave)."""
