"""DataFrame operators: extraction, resolution, components, inference, analytics."""
