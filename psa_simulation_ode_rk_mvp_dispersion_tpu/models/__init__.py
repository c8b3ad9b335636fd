"""Model families: the dual-pump 4-wave FWM/PSA model (fwm4), the N-wave
cascaded FWM comb (nwave), counter-propagating SBS (sbs), the GNLSE
pulse-propagation model (gnlse, split-step Fourier), its two-polarization
vector extension (vgnlse), and the driven-damped Kerr-cavity LLE (lle)."""
