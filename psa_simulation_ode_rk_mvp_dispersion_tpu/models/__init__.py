"""Model families: the dual-pump 4-wave FWM/PSA model (fwm4), the N-wave
cascaded FWM comb (nwave), counter-propagating SBS (sbs), and the GNLSE
pulse-propagation model (gnlse, split-step Fourier)."""
