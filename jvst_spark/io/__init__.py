"""Sources, sinks, synthetic-input derivation, checkpoint manifests."""
