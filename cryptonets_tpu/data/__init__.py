"""L4: dataset preprocessing and model-weight loading."""
