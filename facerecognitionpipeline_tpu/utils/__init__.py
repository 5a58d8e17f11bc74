"""Host-side utilities: image IO, augmentation, misc."""
