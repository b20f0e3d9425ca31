"""Sources & sinks: binary/multimodal ingestion and layout-aware writers."""
