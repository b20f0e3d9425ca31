from .csv_reader import read_contacts_csv, sniff_csv_dialect  # noqa: F401
