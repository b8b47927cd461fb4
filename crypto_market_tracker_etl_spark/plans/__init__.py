"""Named query plans — the reference's SQL-view surface as DataFrame builders."""
