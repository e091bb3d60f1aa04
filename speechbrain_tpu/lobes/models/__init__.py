"""Full model assemblies."""
