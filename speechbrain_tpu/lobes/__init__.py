"""Model assemblies ("lobes"): frontends, encoders, full models."""
