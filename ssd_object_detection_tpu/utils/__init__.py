"""Host-side utilities: visualization and TensorBoard logging."""
