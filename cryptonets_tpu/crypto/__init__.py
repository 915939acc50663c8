"""BFV scheme over uint32 RNS limb tensors (replaces SEAL 3.2, ref L0)."""
