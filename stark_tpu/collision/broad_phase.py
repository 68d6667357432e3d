"""Placeholder: implemented with the contact stage."""
