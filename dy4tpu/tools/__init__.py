"""Developer tools: capture fabrication, rate conversion, PSD inspection."""
