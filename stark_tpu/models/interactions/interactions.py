"""Interactions aggregate: frictional contact + attachments.

Reference: /root/reference/stark/src/models/interactions/Interactions.h:9-24.
"""
from __future__ import annotations


class Interactions:
    def __init__(self, stark, dyn, rb_dyn, rigidbodies):
        from .attachments import EnergyAttachments
        from .contact import EnergyFrictionalContact

        self.contact = EnergyFrictionalContact(stark, dyn, rb_dyn, rigidbodies)
        self.attachments = EnergyAttachments(stark, dyn, rb_dyn)

    def freeze(self, layout, dtype):
        self.contact.freeze(layout, dtype)

    def dynamic_family_data(self):
        return self.contact.dynamic_family_data()

    def glob_entries(self):
        return self.contact.glob_entries()
