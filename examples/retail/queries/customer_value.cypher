MATCH (c:Customer)-[o:ORDERED]->(p:Product)
WITH c.name AS customer, round(sum(o.quantity * p.price), 2) AS total
RETURN customer, total
ORDER BY total DESC
