"""Command-line pipeline scripts (same flag surface + directory schema as the
reference: train -> sample_gan -> traverse_latent_space ->
traverse_attribute_space -> rank_interpretable_paths)."""
