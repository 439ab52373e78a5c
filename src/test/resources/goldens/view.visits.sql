CREATE OR REPLACE TEMPORARY VIEW `visits` AS
SELECT
  img.`day` AS `day`,
  img.`dog` AS `dog`,
  img.`note` AS `note`
FROM (
  SELECT coalesce(`after`, `before`) AS img, `operation`, row_number() OVER (
    PARTITION BY
      coalesce(`after`, `before`).`dog`,
      coalesce(`after`, `before`).`day`
    ORDER BY `timestamp` DESC,
      `lsn` DESC NULLS LAST,
      `sequence` DESC NULLS LAST
  ) AS row_number
  FROM `visits_raw`
)
WHERE row_number = 1
  AND `operation` != 'DELETE'
