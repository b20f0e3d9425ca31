from .validation_pipeline import (  # noqa: F401
    annotate_contacts,
    contacts_validation_plan,
    derive_contacts_batch,
    derive_existing_contacts,
)
